"""k=8 mx3 diagnosis: bit-identity vs truncated oracle + noise report.

Usage: python scripts/mx3_k8_diag.py [k] [g]
"""

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
from mktfhe_tpu.utils.noise import noise_report


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    params = ALL_PRESETS[f"KMS{k}party"]

    a = kms.crs(jax.random.key(0), params)
    parties = [kms.party_keygen(jax.random.key(1 + i), a, params) for i in range(k)]
    scheme_t = kms.setup(a, [p[3] for p in parties], params)
    keys3 = build_mx3_kms_keys([p[3] for p in parties], params)
    lwe_keys = [p[0] for p in parties]

    rng = np.random.default_rng(0)
    m1 = jnp.array(rng.integers(0, 2, g).astype(bool))
    m2 = jnp.array(rng.integers(0, 2, g).astype(bool))
    want = ~(np.asarray(m1) & np.asarray(m2))
    ct1 = lwe_ith_encrypt_bit(jax.random.key(11), m1, 0, lwe_keys[0], params.alpha, k, (g,))
    ct2 = lwe_ith_encrypt_bit(jax.random.key(12), m2, 1, lwe_keys[1], params.alpha, k, (g,))
    ct = gate_affine(0, ct1, ct2)

    got = bootstrap_mx3(ct, scheme_t, keys3, params, pallas_ntt=True)
    ob = np.asarray(got.b)
    rep = noise_report(got, lwe_keys, want)
    print("mx3:", {kk: round(float(v), 2) for kk, v in rep.items()})

    ref = kms.bootstrap(ct, scheme_t, params, pallas_ntt=True)
    rb = np.asarray(ref.b)
    print("bit identical b:", np.array_equal(rb, ob),
          "a:", np.array_equal(np.asarray(ref.a), np.asarray(got.a)))
    rep2 = noise_report(ref, lwe_keys, want)
    print("oracle:", {kk: round(float(v), 2) for kk, v in rep2.items()})


if __name__ == "__main__":
    main()
