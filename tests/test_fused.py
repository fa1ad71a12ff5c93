"""Fully fused step kernel vs the reference engine: bit-identical."""

import jax
import jax.numpy as jnp
import numpy as np

from mktfhe_tpu.kernels.batchminor import convert_scheme
from mktfhe_tpu.kernels.fused_step import bootstrap_fused
from mktfhe_tpu.schemes import cggi
from mktfhe_tpu.schemes.gates import gate_affine, lwe_encrypt_bit

from test_cggi import TINY


def test_fused_engine_bit_identical():
    lwe_key, _rk, scheme = cggi.setup(jax.random.key(7), TINY)
    bm = convert_scheme(scheme, TINY)
    g = 8
    rng = np.random.default_rng(31)
    m1 = rng.integers(0, 2, g).astype(bool)
    m2 = rng.integers(0, 2, g).astype(bool)
    ct1 = lwe_encrypt_bit(jax.random.key(1), jnp.array(m1), lwe_key, TINY.alpha, (g,))
    ct2 = lwe_encrypt_bit(jax.random.key(2), jnp.array(m2), lwe_key, TINY.alpha, (g,))
    ct = gate_affine(0, ct1, ct2)

    ref = cggi.bootstrap(ct, scheme, TINY)
    got = bootstrap_fused(ct, bm, TINY, g_tile=8, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))


def test_decomp_pairs_bias_identical():
    """The bias-trick decomposition (one constant add, no carry chain)
    must be bit-identical to the sequential _decomp_pairs for every
    preset gadget and edge input."""
    import numpy as np
    import jax.numpy as jnp

    from mktfhe_tpu.kernels.fused_kms import _decomp_pairs, _decomp_pairs_bias

    rng = np.random.default_rng(0)
    for (l, log_b) in [(4, 9), (3, 12), (5, 8), (6, 7), (2, 8), (3, 8)]:
        vals = rng.integers(0, 1 << 64, size=2048, dtype=np.uint64)
        vals[:6] = [0, (1 << 64) - 1, 1 << 63, (1 << 63) - 1,
                    0x8000000080000000, 0xFFFFFFFF]
        lo = jnp.asarray((vals & 0xFFFFFFFF).astype(np.uint32))
        hi = jnp.asarray((vals >> 32).astype(np.uint32))
        a = _decomp_pairs(lo, hi, l, log_b)
        b = _decomp_pairs_bias(lo, hi, l, log_b)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
