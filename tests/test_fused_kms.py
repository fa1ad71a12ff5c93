"""Fused KMS phase-1 kernel: bit-identical to the reference engine."""

import jax
import jax.numpy as jnp
import numpy as np

from mktfhe_tpu.kernels.batchminor import build_bm_kms_phase1
from mktfhe_tpu.kernels.fused_kms import (
    _decomp_pairs,
    bootstrap_fused_kms,
    garner_pairs,
)
from mktfhe_tpu.schemes import kms
from mktfhe_tpu.schemes.gates import gate_affine, lwe_ith_encrypt_bit

from test_kms import TINY


def test_decomp_pairs_matches_u64():
    from mktfhe_tpu.ciphertext.decomp import balanced_decomp

    rng = np.random.default_rng(5)
    a = jnp.asarray(rng.integers(0, 1 << 64, size=(1 << 12,), dtype=np.uint64))
    lo = (a & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
    hi = (a >> 32).astype(jnp.uint32)
    for l, log_b in [(3, 12), (4, 9), (5, 8), (2, 7)]:
        want = np.asarray(balanced_decomp(a, l, log_b))  # [..., l]
        got = np.stack([np.asarray(d) for d in _decomp_pairs(lo, hi, l, log_b)], axis=-1)
        np.testing.assert_array_equal(got, want)


def test_garner_pairs_matches_u64():
    from mktfhe_tpu.ring.context import make_ring_ctx
    from mktfhe_tpu.ring.torus import from_crt_u64

    ctx = make_ring_ctx(64, 64, 3)
    rng = np.random.default_rng(7)
    ps = np.asarray(ctx.crt.primes)
    rs = jnp.asarray(
        (rng.integers(0, 1 << 62, size=(3, 256), dtype=np.uint64) % ps[:, None]).astype(
            np.uint32
        )
    )
    want = np.asarray(from_crt_u64(jnp.moveaxis(rs, 0, -2), ctx.crt))
    lo, hi = garner_pairs(rs, ctx)
    got = np.asarray(lo).astype(np.uint64) | (np.asarray(hi).astype(np.uint64) << 32)
    np.testing.assert_array_equal(got, want)


def test_fused_kms_bootstrap_bit_identical():
    params = TINY
    a = kms.crs(jax.random.key(300), params)
    parties = [
        kms.party_keygen(jax.random.key(400 + i), a, params) for i in range(params.k)
    ]
    lwe_keys = [p[0] for p in parties]
    scheme = kms.setup(a, [p[3] for p in parties], params)
    bm_keys = build_bm_kms_phase1([p[3] for p in parties], params)

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
    got = bootstrap_fused_kms(ct, scheme, bm_keys, params, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))
