"""Fine-grained on-chip attribution for the KMS mx2 bootstrap.

Traces (a) one standalone party phase-1 sweep and (b) phase 2 + key
switch, as separate jitted programs so their ops appear at trace top
level, then prints per-op-group totals parsed from the perfetto JSON.

Usage: python scripts/p1_trace2.py [k] [batch]
"""

import collections
import glob
import gzip
import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from mktfhe_tpu.kernels.fused_mx2 import (  # noqa: E402
    build_mx_kms_keys,
    kms_phase1_mx2,
)
from mktfhe_tpu.ring.context import make_ring_ctx  # noqa: E402
from mktfhe_tpu.schemes import kms  # noqa: E402
from mktfhe_tpu.schemes.common import initial_acc  # noqa: E402
from mktfhe_tpu.schemes.kms import _keyswitch, _phase2_party  # noqa: E402
from mktfhe_tpu.schemes.presets import ALL_PRESETS  # noqa: E402


def parse_trace(logdir):
    f = sorted(glob.glob(f"{logdir}/plugins/profile/*/*.trace.json.gz"))[-1]
    d = json.load(gzip.open(f))
    evs = [e for e in d["traceEvents"] if e.get("pid") == 3 and e.get("ph") == "X"]
    durs = collections.Counter()
    counts = collections.Counter()
    for e in evs:
        n = e["name"].split("(")[0]
        durs[n] += e.get("dur", 0)
        counts[n] += 1
    return durs, counts


def main():
    k = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    params = ALL_PRESETS[f"KMS{k}party"]
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)

    a = kms.crs(jax.random.key(0), params)
    parties = [kms.party_keygen(jax.random.key(1 + i), a, params) for i in range(k)]
    scheme = kms.setup(a, [p[3] for p in parties], params, with_brk=False)
    mx_keys = build_mx_kms_keys([p[3] for p in parties], params)
    jax.block_until_ready(mx_keys.brk_mx)

    rng = np.random.default_rng(0)
    tildea = jnp.asarray(
        rng.integers(0, 2 * params.big_n, (g, params.n)).astype(np.int32)
    )

    @jax.jit
    def p1_once_fn(ta, brk, brk_sh):
        return kms_phase1_mx2(ta, brk, brk_sh, params.l_lev, params, ctx)

    out = p1_once_fn(tildea, mx_keys.brk_mx[1], mx_keys.brk_mx_shoup[1])
    jax.block_until_ready(out)

    with jax.profiler.trace("/tmp/p1_only"):
        for _ in range(2):
            out = p1_once_fn(tildea, mx_keys.brk_mx[1], mx_keys.brk_mx_shoup[1])
        jax.block_until_ready(out)
    durs, counts = parse_trace("/tmp/p1_only")
    total = sum(durs.values())
    print(f"== standalone phase-1 (2 reps) total {total/1e3:.1f} ms")
    for n, dur in durs.most_common(18):
        print(f"  {dur/1e3:9.1f} ms x{counts[n]:5d}  {n[:80]}")

    # phase 2 + keyswitch standalone: feed phase-1-shaped levkeys
    levkeys = [
        jnp.tile(out[:, : (1 if p1 == 1 else params.l_lev)], (1, 1, 1, 1, 1))
        for p1 in range(1, k + 1)
    ]

    @jax.jit
    def p2_ks(tildeb, lks):
        acc = initial_acc(tildeb, params.big_n, k, ctx.dtype)
        for p1 in range(1, k + 1):
            acc = _phase2_party(
                acc, lks[p1 - 1], p1, scheme, params, ctx, pallas_ntt=True
            )
        return _keyswitch(acc, scheme, params)

    tildeb = jnp.asarray(rng.integers(0, 2 * params.big_n, (g,)).astype(np.int32))
    o2 = p2_ks(tildeb, levkeys)
    jax.block_until_ready(o2.b)
    with jax.profiler.trace("/tmp/p2_only"):
        for _ in range(2):
            o2 = p2_ks(tildeb, levkeys)
        jax.block_until_ready(o2.b)
    durs2, counts2 = parse_trace("/tmp/p2_only")
    total2 = sum(durs2.values())
    print(f"== standalone phase-2 + keyswitch (2 reps) total {total2/1e3:.1f} ms")
    for n, dur in durs2.most_common(18):
        print(f"  {dur/1e3:9.1f} ms x{counts2[n]:5d}  {n[:80]}")


if __name__ == "__main__":
    main()
