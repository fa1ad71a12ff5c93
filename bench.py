"""Benchmark: gate bootstraps/sec/chip on real hardware.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

Primary metric per BASELINE.json: gate bootstraps/sec/chip.  The reference
publishes no numbers (BASELINE.md), so vs_baseline is reported against the
BASELINE.json north-star target of 100 multi-key gate bootstraps/sec/chip
(vs_baseline = value / 100).  Round 1 benches the CGGI preset (single-key,
N=1024, n=630) batched over gates; later rounds move to KMS k=8.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp

jax.config.update("jax_enable_x64", True)

from mktfhe_tpu.ciphertext.lwe import Lwe
from mktfhe_tpu.schemes import cggi
from mktfhe_tpu.schemes.gates import gate_affine, lwe_encrypt_bit
from mktfhe_tpu.schemes.presets import CGGI_PARAM


def main():
    batch = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    params = CGGI_PARAM

    t0 = time.time()
    lwe_key, _ring, scheme = cggi.setup(jax.random.key(0), params)
    jax.block_until_ready(scheme.brk_hat)
    keygen_s = time.time() - t0

    m = jnp.zeros((batch,), dtype=bool)
    ct1 = lwe_encrypt_bit(jax.random.key(1), m, lwe_key, params.alpha, (batch,))
    ct2 = lwe_encrypt_bit(jax.random.key(2), ~m, lwe_key, params.alpha, (batch,))
    ct = gate_affine(0, ct1, ct2)

    def run(ct):
        return cggi.bootstrap(ct, scheme, params)

    t0 = time.time()
    out = run(ct)
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # timed runs
    reps = 3
    t0 = time.time()
    for _ in range(reps):
        out = run(ct)
    jax.block_until_ready(out)
    dt = (time.time() - t0) / reps

    value = batch / dt
    print(
        f"# keygen {keygen_s:.1f}s, first-call {compile_s:.1f}s, "
        f"steady {dt*1e3:.1f}ms for batch {batch} "
        f"({dt/batch*1e3:.2f} ms/gate)",
        file=sys.stderr,
    )
    print(
        json.dumps(
            {
                "metric": "cggi_gate_bootstraps_per_sec_per_chip",
                "value": round(value, 2),
                "unit": "bootstraps/s",
                "vs_baseline": round(value / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
