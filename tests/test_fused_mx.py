"""mx phase-1 engine (MXU-factorized NTT): bit-identical to the reference
engine at the smallest supported ring (N=128)."""

import jax
import jax.numpy as jnp
import numpy as np

from mktfhe_tpu.kernels.fused_mx import (
    bootstrap_mx,
    build_mx_kms_phase1,
    kms_phase1_mx,
    mx_mono_table,
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


def test_mx_mono_table_matches_transformed_monomials():
    """mono_mx[a] must equal mx_fwd_ref(lift(X^a - 1))."""
    from mktfhe_tpu.kernels.mx_ntt import mx_fwd_ref, mx_plan
    from mktfhe_tpu.ring.torus import lift

    ctx = make_ring_ctx(128, 64, 3)
    plan = mx_plan(ctx.n, ctx.nprimes)
    mono, _sh = mx_mono_table(ctx)
    rng = np.random.default_rng(0)
    for a in [0, 1, 5, 127, 128, 200, 255] + list(rng.integers(0, 256, 4)):
        poly = np.zeros(ctx.n, np.uint64)
        if a < ctx.n:
            poly[a] += 1
        else:
            poly[a - ctx.n] -= 1  # X^(N+a') = -X^a'
        poly[0] -= 1
        want = mx_fwd_ref(lift(jnp.asarray(poly), ctx.crt), plan)
        np.testing.assert_array_equal(np.asarray(mono[int(a)]), np.asarray(want))


def test_mx_phase1_bit_identical():
    params, a, parties = _setup()
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)
    mx_keys = build_mx_kms_phase1([p[3] for p in parties], params)
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
        got = kms_phase1_mx(
            tildea_p, mx_keys.brk_mx[party], mx_keys.brk_mx_shoup[party],
            mx_keys, rows, params, ctx, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mx_bootstrap_bit_identical():
    params, a, parties = _setup()
    lwe_keys = [p[0] for p in parties]
    scheme = kms.setup(a, [p[3] for p in parties], params)
    mx_keys = build_mx_kms_phase1([p[3] for p in parties], params)

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
    got = bootstrap_mx(ct, scheme, mx_keys, params, interpret=True, g_tile=4)
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))
