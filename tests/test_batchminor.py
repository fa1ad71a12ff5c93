"""Batch-minor engine vs the reference CGGI engine: bit-identical outputs."""

import jax
import jax.numpy as jnp
import numpy as np

from mktfhe_tpu.kernels.batchminor import bootstrap_bm, convert_scheme
from mktfhe_tpu.schemes import cggi
from mktfhe_tpu.schemes.gates import gate_affine, lwe_decrypt_bit, lwe_encrypt_bit

from test_cggi import TINY


def test_bm_engine_bit_identical():
    lwe_key, _rk, scheme = cggi.setup(jax.random.key(7), TINY)
    bm = convert_scheme(scheme, TINY)
    g = 8
    rng = np.random.default_rng(21)
    m1 = rng.integers(0, 2, g).astype(bool)
    m2 = rng.integers(0, 2, g).astype(bool)
    ct1 = lwe_encrypt_bit(jax.random.key(1), jnp.array(m1), lwe_key, TINY.alpha, (g,))
    ct2 = lwe_encrypt_bit(jax.random.key(2), jnp.array(m2), lwe_key, TINY.alpha, (g,))
    ct = gate_affine(0, ct1, ct2)

    ref = cggi.bootstrap(ct, scheme, TINY)
    got = bootstrap_bm(ct, bm, TINY, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))
    np.testing.assert_array_equal(
        np.asarray(lwe_decrypt_bit(got, lwe_key)),
        np.array([not (a and b) for a, b in zip(m1, m2)]),
    )


def test_mod_switch_2n_wraps_to_zero():
    """Round-to-nearest at the top of the torus must wrap to 0, not 2N.

    Regression: an a-value within 2^(shift-1) of 2^32 rounds to exactly 2N;
    the 2N-entry monomial tables used by the bm/fused engines would gather
    out of range (clamped to 2N-1 -> wrong monomial, data-dependent lane
    corruption at large batches).
    """
    from mktfhe_tpu.ciphertext.lwe import Lwe
    from mktfhe_tpu.schemes.common import mod_switch_2n

    big_n = 64
    top = jnp.asarray([0xFFFFFFFF, 0x01000000], dtype=jnp.uint32)
    tb, ta = mod_switch_2n(Lwe(b=top, a=top[None]), big_n)
    assert int(tb[0]) == 0 and int(ta[0, 0]) == 0
    assert int(tb[1]) == 1 and int(ta[0, 1]) == 1


def test_bm_engine_bit_identical_large_batch():
    """g=256 sweeps enough lanes to hit the ta==2N edge with high probability."""
    lwe_key, _rk, scheme = cggi.setup(jax.random.key(7), TINY)
    bm = convert_scheme(scheme, TINY)
    g = 256
    rng = np.random.default_rng(21)
    m1 = rng.integers(0, 2, g).astype(bool)
    m2 = rng.integers(0, 2, g).astype(bool)
    ct1 = lwe_encrypt_bit(jax.random.key(1), jnp.array(m1), lwe_key, TINY.alpha, (g,))
    ct2 = lwe_encrypt_bit(jax.random.key(2), jnp.array(m2), lwe_key, TINY.alpha, (g,))
    ct = gate_affine(0, ct1, ct2)
    ref = cggi.bootstrap(ct, scheme, TINY)
    got = bootstrap_bm(ct, bm, TINY, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))
