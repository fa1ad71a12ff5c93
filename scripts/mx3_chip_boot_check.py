"""On-chip bit-identity of bootstrap_mx3 vs truncated-key oracle at
full ring size, reduced steps/parties.  Usage: [k] [n_steps] [g]"""

import dataclasses
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from mktfhe_tpu.kernels.fused_mx3 import bootstrap_mx3, build_mx3_kms_keys
from mktfhe_tpu.schemes import kms
from mktfhe_tpu.schemes.gates import gate_affine, lwe_ith_encrypt_bit
from mktfhe_tpu.schemes.presets import ALL_PRESETS


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 2
    n_steps = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    g = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    params = dataclasses.replace(ALL_PRESETS["KMS8party"], n=n_steps, k=k)

    a = kms.crs(jax.random.key(0), params)
    parties = [kms.party_keygen(jax.random.key(1 + i), a, params) for i in range(k)]
    scheme_t = kms.setup(a, [p[3] for p in parties], params)
    keys3 = build_mx3_kms_keys([p[3] for p in parties], params, chunk=max(4, n_steps))

    rng = np.random.default_rng(0)
    m1 = jnp.array(rng.integers(0, 2, g).astype(bool))
    m2 = jnp.array(rng.integers(0, 2, g).astype(bool))
    lwe_keys = [p[0] for p in parties]
    ct1 = lwe_ith_encrypt_bit(jax.random.key(11), m1, 0, lwe_keys[0], params.alpha, k, (g,))
    ct2 = lwe_ith_encrypt_bit(jax.random.key(12), m2, 1, lwe_keys[1 % k], params.alpha, k, (g,))
    ct = gate_affine(0, ct1, ct2)
    ref = kms.bootstrap(ct, scheme_t, params, pallas_ntt=True)
    got = bootstrap_mx3(ct, scheme_t, keys3, params, pallas_ntt=True)
    rb, ob = np.asarray(ref.b), np.asarray(got.b)
    ra, oa = np.asarray(ref.a), np.asarray(got.a)
    print("b identical:", np.array_equal(rb, ob), "a identical:", np.array_equal(ra, oa))
    if not np.array_equal(rb, ob):
        d = rb.astype(np.int64) - ob.astype(np.int64)
        print("b diff stats: nonzero", (d != 0).mean(), "max|d|", np.abs(d).max())


if __name__ == "__main__":
    main()
