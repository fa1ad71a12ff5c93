"""Natural-layout Pallas engine vs reference engine: bit-identical."""

import jax
import jax.numpy as jnp
import numpy as np

from mktfhe_tpu.kernels.natural import bootstrap_nat
from mktfhe_tpu.schemes import cggi
from mktfhe_tpu.schemes.gates import gate_affine, lwe_encrypt_bit

from test_cggi import TINY


def test_natural_engine_bit_identical():
    lwe_key, _rk, scheme = cggi.setup(jax.random.key(7), TINY)
    g = 8
    rng = np.random.default_rng(41)
    m1 = rng.integers(0, 2, g).astype(bool)
    m2 = rng.integers(0, 2, g).astype(bool)
    ct1 = lwe_encrypt_bit(jax.random.key(1), jnp.array(m1), lwe_key, TINY.alpha, (g,))
    ct2 = lwe_encrypt_bit(jax.random.key(2), jnp.array(m2), lwe_key, TINY.alpha, (g,))
    ct = gate_affine(0, ct1, ct2)

    ref = cggi.bootstrap(ct, scheme, TINY)
    got = bootstrap_nat(ct, scheme, TINY, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))
