"""Phase breakdown of the KMS mx2 bootstrap on the real chip.

Times (a) one party's phase-1 sweep (rows = l_lev), (b) the full
bootstrap, and derives the phase-2 + key-switch share; optionally writes
a device trace (pass 'trace') for xprof.

Usage: python scripts/p1_timing.py [k] [batch] [trace]
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from mktfhe_tpu.kernels.fused_mx2 import (  # noqa: E402
    bootstrap_mx2,
    build_mx_kms_keys,
    kms_phase1_mx2,
)
from mktfhe_tpu.ring.context import make_ring_ctx  # noqa: E402
from mktfhe_tpu.schemes import kms  # noqa: E402
from mktfhe_tpu.schemes.gates import gate_affine, lwe_ith_encrypt_bit  # noqa: E402
from mktfhe_tpu.schemes.presets import ALL_PRESETS  # noqa: E402


def main():
    args = [a for a in sys.argv[1:] if a != "trace"]
    do_trace = "trace" in sys.argv[1:]
    k = int(args[0]) if len(args) > 0 else 8
    g = int(args[1]) if len(args) > 1 else 128
    params = ALL_PRESETS[f"KMS{k}party"]
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)

    a = kms.crs(jax.random.key(0), params)
    parties = [kms.party_keygen(jax.random.key(1 + i), a, params) for i in range(k)]
    scheme = kms.setup(a, [p[3] for p in parties], params, with_brk=False)
    t0 = time.time()
    mx_keys = build_mx_kms_keys([p[3] for p in parties], params)
    jax.block_until_ready(mx_keys.brk_mx)
    keygen_s = time.time() - t0

    rng = np.random.default_rng(0)
    m1 = jnp.array(rng.integers(0, 2, g).astype(bool))
    m2 = jnp.array(rng.integers(0, 2, g).astype(bool))
    ct1 = lwe_ith_encrypt_bit(jax.random.key(11), m1, 0, parties[0][0], params.alpha, k, (g,))
    ct2 = lwe_ith_encrypt_bit(jax.random.key(12), m2, 1, parties[1][0], params.alpha, k, (g,))
    ct = gate_affine(0, ct1, ct2)

    # (a) one party's phase-1 sweep at l_lev rows, dependent-chained
    tildea = jnp.asarray(
        rng.integers(0, 2 * params.big_n, (g, params.n)).astype(np.int32)
    )

    @jax.jit
    def p1_once_fn(ta, brk, brk_sh):
        return kms_phase1_mx2(ta, brk, brk_sh, params.l_lev, params, ctx)

    p1_once = lambda ta: p1_once_fn(ta, mx_keys.brk_mx[1], mx_keys.brk_mx_shoup[1])
    out = p1_once(tildea)
    np.asarray(out)  # compile + hard fetch
    reps = 4
    t0 = time.time()
    cur = tildea
    for _ in range(reps):
        o = p1_once(cur)
        cur = (cur + o[:, 0, 0, 0, : params.n].astype(jnp.int32)) % (2 * params.big_n)
    np.asarray(cur)
    p1_s = (time.time() - t0) / reps

    # (b) full bootstrap, dependent-chained
    boot = lambda c: bootstrap_mx2(c, scheme, mx_keys, params, pallas_ntt=True)
    out = boot(ct)
    np.asarray(out.b)
    t0 = time.time()
    cur = out
    for _ in range(reps):
        cur = boot(gate_affine(0, cur, ct2))
    np.asarray(cur.b)
    full_s = (time.time() - t0) / reps

    p1_total = p1_s * (k - 1) + p1_s / params.l_lev  # party 1 is 1 row
    rec = {
        "k": k,
        "batch": g,
        "keygen_s": round(keygen_s, 1),
        "p1_one_party_ms": round(p1_s * 1e3, 1),
        "p1_total_ms_est": round(p1_total * 1e3, 1),
        "full_ms": round(full_s * 1e3, 1),
        "p2_ks_ms_est": round((full_s - p1_total) * 1e3, 1),
        "ms_per_gate": round(full_s / g * 1e3, 3),
        "bootstraps_per_sec": round(g / full_s, 1),
    }
    print(json.dumps(rec), flush=True)

    if do_trace:
        from mktfhe_tpu.utils.profiling import trace

        with trace("/tmp/mktfhe_trace") as d:
            np.asarray(boot(ct).b)
        print(f"trace written to {d}")


if __name__ == "__main__":
    main()
