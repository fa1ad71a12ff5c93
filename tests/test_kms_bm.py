"""KMS batch-minor phase-1 engine vs the reference engine: bit-identical."""

import jax
import jax.numpy as jnp
import numpy as np

from mktfhe_tpu.kernels.batchminor import build_bm_kms_phase1
from mktfhe_tpu.schemes import kms
from mktfhe_tpu.schemes.gates import gate_affine, lwe_ith_encrypt_bit

from test_kms import TINY


def test_kms_bm_bit_identical():
    params = TINY
    a = kms.crs(jax.random.key(300), params)
    parties = [
        kms.party_keygen(jax.random.key(400 + i), a, params) for i in range(params.k)
    ]
    lwe_keys = [p[0] for p in parties]
    scheme = kms.setup(a, [p[3] for p in parties], params)
    bm_keys = build_bm_kms_phase1([p[3] for p in parties], params)

    g = 4
    rng = np.random.default_rng(17)
    m1 = rng.integers(0, 2, g).astype(bool)
    m2 = rng.integers(0, 2, g).astype(bool)
    ct1 = lwe_ith_encrypt_bit(
        jax.random.key(1), jnp.array(m1), 0, lwe_keys[0], params.alpha, params.k, (g,)
    )
    ct2 = lwe_ith_encrypt_bit(
        jax.random.key(2), jnp.array(m2), 1, lwe_keys[1], params.alpha, params.k, (g,)
    )
    ct = gate_affine(0, ct1, ct2)

    ref = kms.bootstrap(ct, scheme, params)
    got = kms.bootstrap_bm(ct, scheme, bm_keys, params, interpret=True)
    np.testing.assert_array_equal(np.asarray(got.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(got.a), np.asarray(ref.a))
