"""mx3 (restructured exact) phase-1 engine tests.

mx3 keeps mx2's exact 3-prime arithmetic (same key material), so every
comparison against the jnp reference engine is bit-exact.
"""

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from mktfhe_tpu.kernels.fused_mx3 import (
    bootstrap_mx3,
    build_mx3_kms_keys,
    kms_phase1_mx3,
)
from mktfhe_tpu.ring.context import make_ring_ctx
from mktfhe_tpu.schemes import kms
from mktfhe_tpu.schemes.gates import gate_affine, lwe_ith_encrypt_bit
from mktfhe_tpu.schemes.presets import TINY_KMS_2PARTY_MX as TINYMX

# N=256 variant: nb=2, the smallest ring exercising the absorbed
# first/last stage (matrix-variant) path and the twisted stage tables.
TINYMX2 = dataclasses.replace(TINYMX, big_n=256)
# N=512 variant: nb=4, the smallest ring where the twisted CT/GS
# butterfly loops (fwd_stages/inv_stages) actually execute (at nb=2 the
# stage loop bodies are empty -- everything is absorbed into the matrix
# variants).
TINYMX4 = dataclasses.replace(TINYMX, big_n=512)


def _setup(params):
    a = kms.crs(jax.random.key(300), params)
    parties = [
        kms.party_keygen(jax.random.key(400 + i), a, params) for i in range(params.k)
    ]
    scheme = kms.setup(a, [p[3] for p in parties], params)
    return params, a, parties, scheme


def _phase1_cases(params):
    _, a, parties, scheme = _setup(params)
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)
    keys3 = build_mx3_kms_keys([p[3] for p in parties], params, chunk=3)
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
        got = kms_phase1_mx3(
            tildea_p, keys3.brk_mx[party], keys3.brk_mx_shoup[party],
            rows, params, ctx, g_tile=4, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mx3_phase1_bit_identical_nb1():
    _phase1_cases(TINYMX)


def test_mx3_phase1_bit_identical_nb2():
    """N=256: covers the absorbed stage-1/stage-last matrix variants."""
    _phase1_cases(TINYMX2)


def test_mx3_phase1_bit_identical_nb4():
    """N=512: the twisted CT/GS stage loops run (mlen=2 fwd, mlen=4 inv),
    exercising twisted_stage_tables entries beyond e=1 under pytest."""
    _phase1_cases(TINYMX4)


def test_mx3_phase1_default_gtile_small_batch():
    """batch < default g_tile=128: the kernel must resolve g_tile down to
    the batch instead of tracing mismatched scratch shapes (round-4
    advisor finding)."""
    params = TINYMX2
    _, a, parties, scheme = _setup(params)
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)
    keys3 = build_mx3_kms_keys([p[3] for p in parties], params, chunk=3)
    rng = np.random.default_rng(7)
    g = 4
    tildea_p = jnp.asarray(
        rng.integers(0, 2 * params.big_n, size=(g, params.n), dtype=np.int64
        ).astype(np.int32)
    )
    ref = kms.phase1(
        tildea_p, scheme.brk_hat[1], scheme.brk_shoup[1],
        params.l_lev, params, ctx,
    )
    got = kms_phase1_mx3(
        tildea_p, keys3.brk_mx[1], keys3.brk_mx_shoup[1],
        params.l_lev, params, ctx, interpret=True,  # default g_tile=128 > g
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mx3_phase1_gtile_split():
    params = TINYMX2
    _, a, parties, scheme = _setup(params)
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)
    keys3 = build_mx3_kms_keys([p[3] for p in parties], params, chunk=3)
    rng = np.random.default_rng(5)
    g = 4
    tildea_p = jnp.asarray(
        rng.integers(0, 2 * params.big_n, size=(g, params.n), dtype=np.int64
        ).astype(np.int32)
    )
    ref = kms.phase1(
        tildea_p, scheme.brk_hat[1], scheme.brk_shoup[1],
        params.l_lev, params, ctx,
    )
    got = kms_phase1_mx3(
        tildea_p, keys3.brk_mx[1], keys3.brk_mx_shoup[1],
        params.l_lev, params, ctx, g_tile=2, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mx3_phase1_no_stored_shoup_bit_identical():
    """brk without a stored Shoup table (the KMS16 memory mode): the
    kernel derives approximate companions in-kernel; outputs bit-match
    the stored-shoup path exactly (same residues mod p)."""
    params = TINYMX2
    _, a, parties, scheme = _setup(params)
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)
    keys3 = build_mx3_kms_keys([p[3] for p in parties], params, chunk=3)
    rng = np.random.default_rng(31)
    g = 4
    tildea_p = jnp.asarray(
        rng.integers(0, 2 * params.big_n, size=(g, params.n), dtype=np.int64
        ).astype(np.int32)
    )
    ref = kms_phase1_mx3(
        tildea_p, keys3.brk_mx[1], keys3.brk_mx_shoup[1],
        params.l_lev, params, ctx, g_tile=4, interpret=True,
    )
    got = kms_phase1_mx3(
        tildea_p, keys3.brk_mx[1], None,
        params.l_lev, params, ctx, g_tile=4, interpret=True,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mx3_phase1_wide_gadget_bit_identical():
    """log_b > 9 (the KMS2party-style wide gadget): the base-256 digit
    split planes + 2^8-scaled matrix set, bit-exact vs kms.phase1."""
    _phase1_cases(dataclasses.replace(TINYMX2, log_b_gsw=12))


def test_mx3_phase1_block_bit_identical():
    """Block-binary phase 1 (U/V split) vs kms.phase1_block, bit-exact."""
    from mktfhe_tpu.schemes.params import KmsBlockParams

    params = KmsBlockParams(
        d=3, ell=3, alpha=16.0, f=8, log_d=2, big_n=256, beta=4.0,
        l_gsw=3, log_b_gsw=8, l_lev=2, log_b_lev=8, l_uni=3, log_b_uni=8, k=2,
    )
    _, a, parties, scheme = _setup(params)
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)
    keys3 = build_mx3_kms_keys([p[3] for p in parties], params, chunk=3)
    rng = np.random.default_rng(21)
    g = 4
    tildea_p = jnp.asarray(
        rng.integers(0, 2 * params.big_n, size=(g, params.n), dtype=np.int64
        ).astype(np.int32)
    )
    for party, rows in [(0, 1), (1, params.l_lev)]:
        ref = kms.phase1_block(
            tildea_p, scheme.brk_hat[party], scheme.brk_shoup[party],
            rows, scheme, params, ctx,
        )
        got = kms_phase1_mx3(
            tildea_p, keys3.brk_mx[party], keys3.brk_mx_shoup[party],
            rows, params, ctx, g_tile=4, interpret=True,
        )
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


def test_mx3_bootstrap_block_bit_identical():
    """Full block-preset bootstrap through the mx3 engine vs kms.bootstrap."""
    from mktfhe_tpu.schemes.params import KmsBlockParams

    params = KmsBlockParams(
        d=3, ell=3, alpha=16.0, f=8, log_d=2, big_n=256, beta=4.0,
        l_gsw=3, log_b_gsw=8, l_lev=2, log_b_lev=8, l_uni=3, log_b_uni=8, k=2,
    )
    _, a, parties, scheme = _setup(params)
    lwe_keys = [p[0] for p in parties]
    keys3 = build_mx3_kms_keys([p[3] for p in parties], params, chunk=3)
    rng = np.random.default_rng(23)
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
    got = bootstrap_mx3(ct, scheme, keys3, params, interpret=True, g_tile=4)
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))


def test_mx3_bootstrap_bit_identical():
    params = TINYMX2
    _, a, parties, scheme = _setup(params)
    lwe_keys = [p[0] for p in parties]
    keys3 = build_mx3_kms_keys([p[3] for p in parties], params, chunk=3)

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
    got = bootstrap_mx3(ct, scheme, keys3, params, interpret=True, g_tile=4)
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))


def test_mx3_derive_mid_row():
    """derive_mid: rows 0/2 bit-match the full sweep; row 1 equals the
    torus-scaled row 2 (B_lev * row2) re-transformed."""
    from mktfhe_tpu.ring.ntt import fwd_ntt, inv_ntt
    from mktfhe_tpu.ring.torus import from_crt, lift

    params = dataclasses.replace(TINYMX2, l_lev=3, log_b_lev=6)
    _, a, parties, scheme = _setup(params)
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)
    keys3 = build_mx3_kms_keys([p[3] for p in parties], params, chunk=3)
    rng = np.random.default_rng(9)
    g = 4
    tildea_p = jnp.asarray(
        rng.integers(0, 2 * params.big_n, size=(g, params.n), dtype=np.int64
        ).astype(np.int32)
    )
    full = kms_phase1_mx3(
        tildea_p, keys3.brk_mx[1], keys3.brk_mx_shoup[1],
        params.l_lev, params, ctx, g_tile=4, interpret=True,
    )
    got = kms_phase1_mx3(
        tildea_p, keys3.brk_mx[1], keys3.brk_mx_shoup[1],
        params.l_lev, params, ctx, g_tile=4, interpret=True, derive_mid=True,
    )
    np.testing.assert_array_equal(np.asarray(got[:, 0]), np.asarray(full[:, 0]))
    np.testing.assert_array_equal(np.asarray(got[:, 2]), np.asarray(full[:, 2]))
    # expected row 1: torus(row2) << log_b_lev, re-lifted
    row2_t = from_crt(inv_ntt(full[:, 2], ctx.plan), ctx.crt, ctx.dtype)
    want_mid = fwd_ntt(
        lift(row2_t << jnp.uint64(params.log_b_lev), ctx.crt), ctx.plan
    )
    np.testing.assert_array_equal(np.asarray(got[:, 1]), np.asarray(want_mid))
