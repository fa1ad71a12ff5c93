"""Virtual-mesh scaling + communication-volume report -> PARALLEL.md.

Runs the explicit shard_map KMS bootstrap (parallel/shardmap.py) at every
(party, batch) factorization of an 8-device virtual CPU mesh with a k=8
tiny preset, measuring steady-state wall-clock and computing the analytic
per-device communication volumes at the REAL KMS presets (SURVEY.md
section 5's pattern: phase 1 no comm; one lev-key all_gather at the phase
boundary; two gate-reassembly all_gathers after the split phase 2).

Wall-clock on a virtual mesh shares 2 host cores across all 8 devices, so
it measures *overhead and correctness of the collective program*, not
real scaling -- the communication table is the transferable artifact.

Usage: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
       python scripts/mesh_scaling.py
"""

import json
import os
import sys
import time

sys.path.insert(0, ".")

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import numpy as np

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import __graft_entry__ as graft  # noqa: E402
from mktfhe_tpu.parallel import (  # noqa: E402
    kms_bootstrap_shardmap,
    make_mesh,
    shard_scheme,
)
from mktfhe_tpu.schemes import kms  # noqa: E402
from mktfhe_tpu.schemes.presets import ALL_PRESETS  # noqa: E402


def measure(params, n_party, n_batch, g, reps=3):
    mesh = make_mesh(n_party, n_batch)
    ct, scheme = graft._make_inputs(params, g)
    sh = shard_scheme(scheme, mesh)
    out = kms_bootstrap_shardmap(ct, sh, params, mesh)
    ref = kms.bootstrap(ct, scheme, params)
    ok = bool(
        np.array_equal(np.asarray(out.b), np.asarray(ref.b))
        and np.array_equal(np.asarray(out.a), np.asarray(ref.a))
    )
    t0 = time.time()
    for _ in range(reps):
        out = kms_bootstrap_shardmap(ct, sh, params, mesh)
        np.asarray(out.b)
    dt = (time.time() - t0) / reps
    return {"mesh": f"{n_party}x{n_batch}", "g": g, "ms": round(dt * 1e3, 1), "bit_identical": ok}


def comm_volumes(params, n_party, n_batch, g):
    """Per-device received bytes for one batch of g gates (u32 words)."""
    k, n, big_n = params.k, params.n, params.big_n
    npr = params.ring_nprimes
    g_local = g // n_batch
    # phase boundary: all_gather of per-party lev keys over 'party'
    lev_words = g_local * params.l_lev * 2 * npr * big_n
    ag_lev = (k - k // n_party) * lev_words * 4
    # phase-2 gate reassembly (when the local batch splits): b + a
    ag_out = (n_party - 1) * (g_local // n_party) * (k * n + 1) * 4 if g_local % n_party == 0 else 0
    # per-device resident brk shard (mx layout, u32 + shoup)
    brk_dev = (k // n_party) * n * npr * (2 * params.l_gsw) * 2 * big_n * 4 * 2
    return {
        "preset_k": k,
        "mesh": f"{n_party}x{n_batch}",
        "g": g,
        "all_gather_levkeys_MB": round(ag_lev / 1e6, 1),
        "all_gather_output_MB": round(ag_out / 1e6, 2),
        "brk_resident_GB_per_device": round(brk_dev / 1e9, 2),
    }


def main():
    rows = []
    params = graft._TINY8_PARAMS
    for np_, nb_ in [(1, 8), (2, 4), (4, 2), (8, 1)]:
        r = measure(params, np_, nb_, g=32)
        print(json.dumps(r), flush=True)
        rows.append(r)

    comms = []
    for preset, g in [("KMS8party", 128), ("KMS16party", 128), ("KMS32party", 128)]:
        p = ALL_PRESETS[preset]
        for np_ in [2, 4, 8] if p.k >= 8 else [2]:
            if p.k % np_:
                continue
            comms.append(comm_volumes(p, np_, 8 // np_ if np_ < 8 else 1, g))
    for c in comms:
        print(json.dumps(c), flush=True)

    lines = [
        "# PARALLEL — multi-chip design, measured collectives, key residency",
        "",
        "## Mesh + collective pattern",
        "",
        "Mesh axes: `(party, batch)` (`parallel/mesh.py`).  Phase 1 shards by",
        "party (zero communication — the reference's `@spawn` per party,",
        "bootstrapping.jl:376-378, becomes a `shard_map`); the phase boundary",
        "is ONE `all_gather` of the per-party lev keys over the `party` axis;",
        "phase 2 splits the local gate batch across the party-axis devices and",
        "reassembles with two more `all_gather`s (`parallel/shardmap.py`).",
        "",
        "## Virtual-mesh wall-clock (8 CPU devices, k=8 tiny preset, g=32)",
        "",
        "All 8 virtual devices share 2 host cores: this validates the",
        "collective program end-to-end and measures its overhead; it is NOT a",
        "hardware scaling number (no multi-chip hardware in this environment —",
        "the driver's `dryrun_multichip` compiles the same program).",
        "",
        "| mesh (party x batch) | ms/batch | bit-identical to 1-device |",
        "|---|---|---|",
    ]
    for r in rows:
        lines.append(f"| {r['mesh']} | {r['ms']} | {r['bit_identical']} |")
    lines += [
        "",
        "## Communication volumes at real presets (per device, per batch of 128)",
        "",
        "| preset | mesh | lev-key all_gather | output all_gather | resident brk/device |",
        "|---|---|---|---|---|",
    ]
    for c in comms:
        lines.append(
            f"| KMS{c['preset_k']}party | {c['mesh']} | {c['all_gather_levkeys_MB']} MB "
            f"| {c['all_gather_output_MB']} MB | {c['brk_resident_GB_per_device']} GB |"
        )
    lines += [
        "",
        "The lev-key all_gather rides ICI (party axis inside a slice); at",
        "KMS8party/128 gates it is ~0.4 GB per device — ~0.5 ms at v5e ICI",
        "bandwidth, overlappable with the phase-2 compute of the previous",
        "batch.  Phase 1 dominates compute, so party-axis scaling is",
        "near-linear until the all_gather stops hiding.",
        "",
        "## Key residency plan (k = 16 / 32)",
        "",
        "Sharded by party today: `brk` (phase 1 streams only the local",
        "parties' keys — `shardmap.py` passes them as `P('party')` operands,",
        "and the replicated scheme operand has its brk leaves stripped, so no",
        "all-gather of the 0.4–0.7 GB/party key material can occur).",
        "",
        "Replicated today: CRS, `pub_b`, `rlk`, `ksk` (phase-2/key-switch",
        "material).  Sizes at k=32: rlk ≈ 9.4 MB/party, pub_b ≈ 4.7 MB/party,",
        "ksk ≈ 590 MB total int8 — replication tops out ~1 GB/device at k=32,",
        "acceptable on 16 GB chips; brk is the only component that MUST shard.",
        "When it stops being acceptable (larger gadgets / bigger N): shard",
        "rlk/pub_b/ksk by party and, in the sequential phase-2 merge, have the",
        "owning device broadcast party p1's rlk rows (one `ppermute`/bcast of",
        "~10 MB per merge step, overlapped with merge step p1-1), and run the",
        "per-party key switch on the owning device with a `psum` of the b",
        "terms + concatenation of disjoint a segments (the reference's",
        "partial-ciphertext pattern, bootstrapping.jl:340-363, as collectives).",
        "",
        "Raw data: this file is generated by `scripts/mesh_scaling.py`.",
    ]
    with open("PARALLEL.md", "w") as f:
        f.write("\n".join(lines) + "\n")
    print("wrote PARALLEL.md")


if __name__ == "__main__":
    main()
