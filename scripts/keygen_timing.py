"""Span breakdown of the bench's keygen phase (VERDICT round-3 item 5:
kms8 keygen regressed 59.9s -> 191.2s between rounds 2 and 3).

Times each span with hard device syncs: crs, first party_keygen
(compile + run), remaining 7 (cached), setup, mx key conversion.

Usage: python scripts/keygen_timing.py [k]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax

jax.config.update("jax_enable_x64", True)

from mktfhe_tpu.schemes import kms  # noqa: E402
from mktfhe_tpu.schemes.presets import ALL_PRESETS  # noqa: E402


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    params = ALL_PRESETS[f"KMS{k}party"]
    spans = {}

    t0 = time.time()
    a = kms.crs(jax.random.key(0), params)
    jax.block_until_ready(a)
    spans["crs_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    p0 = kms.party_keygen(jax.random.key(1), a, params)
    jax.block_until_ready(p0[3].brk)
    spans["party_keygen_first_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    parties = [p0] + [
        kms.party_keygen(jax.random.key(2 + i), a, params) for i in range(k - 1)
    ]
    jax.block_until_ready(parties[-1][3].brk)
    spans["party_keygen_rest_s"] = round(time.time() - t0, 1)

    t0 = time.time()
    scheme = kms.setup(a, [p[3] for p in parties], params, with_brk=False)
    jax.block_until_ready(scheme.ksk_a)
    spans["setup_s"] = round(time.time() - t0, 1)

    from mktfhe_tpu.kernels.fused_mx2 import build_mx_kms_keys

    t0 = time.time()
    keys = build_mx_kms_keys([p[3] for p in parties], params)
    jax.block_until_ready(keys.brk_mx)
    spans["build_mx_keys_s"] = round(time.time() - t0, 1)
    spans["total_s"] = round(sum(spans.values()), 1)
    print(json.dumps(spans), flush=True)


if __name__ == "__main__":
    main()
