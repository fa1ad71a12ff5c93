"""On-chip bit-identity check for the mx3 sweep vs the truncated-key
oracle, at full ring size (N=2048, nb=16) but few steps/parties.

Usage: python scripts/mx3_chip_check.py [n_steps] [rows] [g]
"""

import dataclasses
import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from mktfhe_tpu.kernels.fused_mx3 import build_mx3_kms_keys, kms_phase1_mx3
from mktfhe_tpu.ring.context import make_ring_ctx
from mktfhe_tpu.schemes import kms
from mktfhe_tpu.schemes.presets import ALL_PRESETS


def main():
    n_steps = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    rows = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    g = int(sys.argv[3]) if len(sys.argv) > 3 else 128
    base = ALL_PRESETS["KMS8party"]
    params = dataclasses.replace(base, n=n_steps, k=1)
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)

    a = kms.crs(jax.random.key(0), params)
    lwe_key, gsw_key, uni_key, pk = kms.party_keygen(jax.random.key(1), a, params)
    scheme_t = kms.setup(a, [pk], params)
    keys3 = build_mx3_kms_keys([pk], params, chunk=max(4, n_steps))

    rng = np.random.default_rng(3)
    tildea_p = jnp.asarray(
        rng.integers(0, 2 * params.big_n, size=(g, n_steps), dtype=np.int64
        ).astype(np.int32)
    )
    ref = kms.phase1(
        tildea_p, scheme_t.brk_hat[0], scheme_t.brk_shoup[0], rows, params, ctx
    )
    got = kms_phase1_mx3(
        tildea_p, keys3.brk_mx[0], keys3.brk_mx_shoup[0], rows, params, ctx
    )
    r = np.asarray(ref)
    o = np.asarray(got)
    same = np.array_equal(r, o)
    print("bit identical:", same)
    if not same:
        d = r != o
        print("mismatch fraction:", d.mean())
        idx = np.argwhere(d)
        print("first mismatches (g,row,comp,npr,N):", idx[:5])
        print("ref", r[tuple(idx[0])], "got", o[tuple(idx[0])])


if __name__ == "__main__":
    main()
