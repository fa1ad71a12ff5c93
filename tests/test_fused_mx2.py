"""v2 mx phase-1 engine (whole-rotation sweep kernel): bit-identical to the
jnp reference engine at the smallest supported ring (N=128)."""

import jax
import jax.numpy as jnp
import numpy as np

from mktfhe_tpu.kernels.fused_mx2 import (
    bootstrap_mx2,
    build_mx_kms_keys,
    kms_phase1_mx2,
    mono_factor_tables,
)
from mktfhe_tpu.ring.context import make_ring_ctx
from mktfhe_tpu.schemes import kms
from mktfhe_tpu.schemes.gates import gate_affine, lwe_ith_encrypt_bit
from mktfhe_tpu.schemes.presets import TINY_KMS_2PARTY_MX as TINYMX


def _setup():
    params = TINYMX
    a = kms.crs(jax.random.key(300), params)
    parties = [
        kms.party_keygen(jax.random.key(400 + i), a, params) for i in range(params.k)
    ]
    return params, a, parties


def test_mono_factorization_matches_table():
    """A[a,k1]*B[a,b'] - 1 must equal the full monomial table mono_mx[a]."""
    from mktfhe_tpu.kernels.fused_mx2 import mx_mono_table
    from mktfhe_tpu.kernels.mx_ntt import NK, mx_plan

    ctx = make_ring_ctx(128, 64, 3)
    plan = mx_plan(ctx.n, ctx.nprimes)
    nb = plan.nb
    mono, _sh = mx_mono_table(ctx)  # [2N, npr, N]
    a_tab, _, b_tab, _ = mono_factor_tables(ctx.n, ctx.nprimes)
    primes = np.asarray(plan.primes, np.uint64)
    for a in [0, 1, 7, 127, 128, 255]:
        prod = (
            a_tab[:, a].astype(np.uint64)[:, None, :]
            * b_tab[:, a].astype(np.uint64)[:, :, None]
        ) % primes[:, None, None]  # [npr, nb, NK]
        want = (prod + primes[:, None, None] - 1) % primes[:, None, None]
        got = np.asarray(mono[a]).reshape(ctx.nprimes, nb, NK)
        np.testing.assert_array_equal(got, want.astype(np.uint32))



def test_mx2_phase1_bit_identical():
    params, a, parties = _setup()
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)
    mx_keys = build_mx_kms_keys([p[3] for p in parties], params)
    scheme = kms.setup(a, [p[3] for p in parties], params)

    rng = np.random.default_rng(3)
    g = 4
    tildea_p = jnp.asarray(
        rng.integers(0, 2 * params.big_n, size=(g, params.n), dtype=np.int64
        ).astype(np.int32)
    )
    for party, rows in [(0, 1), (1, params.l_lev)]:
        ref = kms.phase1(
            tildea_p, scheme.brk_hat[party], scheme.brk_shoup[party],
            rows, params, ctx,
        )
        got = kms_phase1_mx2(
            tildea_p, mx_keys.brk_mx[party], mx_keys.brk_mx_shoup[party],
            rows, params, ctx, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mx2_phase1_gtile_split():
    """g_tile < G exercises the (batch-tile, step) grid with acc revisits."""
    params, a, parties = _setup()
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)
    mx_keys = build_mx_kms_keys([p[3] for p in parties], params)
    scheme = kms.setup(a, [p[3] for p in parties], params)
    rng = np.random.default_rng(5)
    g = 4
    tildea_p = jnp.asarray(
        rng.integers(0, 2 * params.big_n, size=(g, params.n), dtype=np.int64
        ).astype(np.int32)
    )
    ref = kms.phase1(
        tildea_p, scheme.brk_hat[1], scheme.brk_shoup[1], params.l_lev, params, ctx
    )
    got = kms_phase1_mx2(
        tildea_p, mx_keys.brk_mx[1], mx_keys.brk_mx_shoup[1],
        params.l_lev, params, ctx, g_tile=2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mx2_bootstrap_bit_identical():
    params, a, parties = _setup()
    lwe_keys = [p[0] for p in parties]
    scheme = kms.setup(a, [p[3] for p in parties], params)
    mx_keys = build_mx_kms_keys([p[3] for p in parties], params)

    rng = np.random.default_rng(13)
    g = 4
    m1 = rng.integers(0, 2, size=g).astype(bool)
    m2 = rng.integers(0, 2, size=g).astype(bool)
    ct1 = lwe_ith_encrypt_bit(
        jax.random.key(1), jnp.array(m1), 0, lwe_keys[0], params.alpha, params.k, (g,)
    )
    ct2 = lwe_ith_encrypt_bit(
        jax.random.key(2), jnp.array(m2), 1, lwe_keys[1], params.alpha, params.k, (g,)
    )
    ct = gate_affine(0, ct1, ct2)
    ref = kms.bootstrap(ct, scheme, params)
    got = bootstrap_mx2(ct, scheme, mx_keys, params, interpret=True, g_tile=4)
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))


def test_mono_factorization_matches_table_nb2():
    """nb=2 (N=256): covers the B-factor/bitrev half of the A*B monomial
    factorization, degenerate at N=128 (advisor round 3, finding 1)."""
    from mktfhe_tpu.kernels.fused_mx2 import mx_mono_table
    from mktfhe_tpu.kernels.mx_ntt import NK, mx_plan

    ctx = make_ring_ctx(256, 64, 3)
    plan = mx_plan(ctx.n, ctx.nprimes)
    nb = plan.nb
    assert nb == 2
    mono, _sh = mx_mono_table(ctx)  # [2N, npr, N]
    a_tab, _, b_tab, _ = mono_factor_tables(ctx.n, ctx.nprimes)
    primes = np.asarray(plan.primes, np.uint64)
    for a in [0, 1, 5, 129, 255, 256, 300, 511]:
        prod = (
            a_tab[:, a].astype(np.uint64)[:, None, :]
            * b_tab[:, a].astype(np.uint64)[:, :, None]
        ) % primes[:, None, None]  # [npr, nb, NK]
        want = (prod + primes[:, None, None] - 1) % primes[:, None, None]
        got = np.asarray(mono[a]).reshape(ctx.nprimes, nb, NK)
        np.testing.assert_array_equal(got, want.astype(np.uint32))
