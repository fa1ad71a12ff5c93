"""Micro-bench of the mx3 phase-1 sweep kernel (synthetic keys).

Times the RAW pallas sweep kernel (make_mx3_sweep_kernel) with random brk
residues, chaining the accumulator output straight back into the input so
each rep is one full 560-step sweep with no XLA-side conversion or gather
in the loop.  Timing does not depend on key values; bit-identity is
guarded separately by tests + scripts/engine_check.py.

Usage: python scripts/mx3_ubench.py [k|preset] [batch] [reps] [rows]
  first arg: a party count (-> KMS{k}party) or a full preset name
  (e.g. KMS8partyblock).
Prints one JSON line: sweep ms, us/(step*row), and a KMS-k bootstrap
estimate assuming rows-chunking [2]*m+[1]*r and the measured ~150 ms
phase-2/keyswitch share (PERF.md).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def main():
    arg = sys.argv[1] if len(sys.argv) > 1 else "8"
    g = int(sys.argv[2]) if len(sys.argv) > 2 else 128
    reps = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    from mktfhe_tpu.kernels.fused_mx2 import _gather_mono_factors
    from mktfhe_tpu.kernels.fused_mx3 import make_mx3_sweep_kernel, mx3_nprimes
    from mktfhe_tpu.kernels.mx_ntt import NK, mx_plan
    from mktfhe_tpu.ring.context import make_ring_ctx
    from mktfhe_tpu.schemes.params import KmsBlockParams
    from mktfhe_tpu.schemes.presets import ALL_PRESETS

    params = ALL_PRESETS[arg if arg in ALL_PRESETS else f"KMS{arg}party"]
    k = params.k
    rows = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    npr = mx3_nprimes(params)
    ctx_p = make_ring_ctx(params.big_n, params.ring_torus_bits, npr)
    plan = mx_plan(params.big_n, npr)
    nb = plan.nb
    n, cpl = params.n, 2 * params.l_gsw
    ell = params.ell if isinstance(params, KmsBlockParams) else 1
    n_steps = n // ell

    rng = np.random.default_rng(0)
    primes = np.asarray(plan.primes, np.uint64)
    brk = rng.integers(
        0, primes[None, :, None, None, None], size=(n, npr, cpl, 2, params.big_n)
    ).astype(np.uint32)
    sh = ((brk.astype(np.uint64) << 32) // primes[None, :, None, None, None]).astype(
        np.uint32
    )
    brk_steps = jnp.asarray(brk.reshape(n_steps, ell, npr, cpl, 2, nb, NK))
    brk_sh_steps = jnp.asarray(sh.reshape(n_steps, ell, npr, cpl, 2, nb, NK))
    tildea = jnp.asarray(rng.integers(0, 2 * params.big_n, (g, n)).astype(np.int32))
    a_fac, a_sh, b_fac, b_sh = _gather_mono_factors(tildea, params.big_n, npr)
    a_fac = a_fac.reshape(n_steps, ell, *a_fac.shape[1:])
    a_sh = a_sh.reshape(*a_fac.shape)
    b_fac = b_fac.reshape(n_steps, ell, *b_fac.shape[1:])
    b_sh = b_sh.reshape(*b_fac.shape)
    a_fac, a_sh, b_fac, b_sh = jax.block_until_ready((a_fac, a_sh, b_fac, b_sh))

    sweep = make_mx3_sweep_kernel(params, ctx_p, rows, n_steps, min(g, 128), False, ell=ell)

    @jax.jit
    def run(lo, hi, b, bs, af, ash, bf, bsh):
        return sweep(lo, hi, b, bs, af, ash, bf, bsh)

    acc_lo = jnp.zeros((rows, 2, nb, NK, g), dtype=jnp.uint32)
    acc_hi = jnp.zeros((rows, 2, nb, NK, g), dtype=jnp.uint32)
    lo, hi = run(acc_lo, acc_hi, brk_steps, brk_sh_steps, a_fac, a_sh, b_fac, b_sh)
    np.asarray(lo)  # compile + hard fetch
    t0 = time.time()
    for _ in range(reps):
        lo, hi = run(lo, hi, brk_steps, brk_sh_steps, a_fac, a_sh, b_fac, b_sh)
    np.asarray(lo)
    dt = (time.time() - t0) / reps
    # bootstrap estimate: total row-sweeps = (k-1)*l_lev + 1, chunked as
    # this kernel's rows; assume per-step-row cost carries over.
    usr = dt / (n_steps * rows)
    total_rows = (k - 1) * params.l_lev + 1
    est = total_rows * n_steps * usr + 0.150 * g / 128
    rec = {
        "preset": arg if arg in ALL_PRESETS else f"KMS{arg}party",
        "batch": g,
        "rows": rows,
        "sweep_ms": round(dt * 1e3, 1),
        "us_per_block_row": round(usr * 1e6, 1),
        "boots_per_sec_est": round(g / est, 2),
    }
    print(json.dumps(rec), flush=True)


if __name__ == "__main__":
    main()
