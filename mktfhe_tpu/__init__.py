"""mktfhe_tpu: a TPU-native multi-key TFHE framework.

A from-scratch JAX/XLA implementation with the capabilities of the
SNUCP/MKTFHE reference (multi-key TFHE over the torus, eprint 2022/1460):
CGGI single-key gate bootstrapping, the LMSS block-binary variant, CCS19
multi-key bootstrapping, and the KMS two-phase multi-key scheme (plus its
block-binary variant), with the same 16 parameter presets.

Design stance (vs. the Julia reference at /root/reference):
  * All polynomial arithmetic is exact, via negacyclic NTTs over 30-bit CRT
    primes in uint32 lanes -- no Float64 FFT, no precision caveats.
  * Ciphertexts are batched pytrees of stacked arrays; the gate API is
    vmapped over a batch of gates (the main TPU throughput lever).
  * Blind rotation is a lax.scan over key bits; multi-key phase 1 shards
    over a `party` mesh axis; key switching is an int8 MXU matmul.

uint64 torus support (the KMS schemes) requires jax x64 mode, enabled at
import.
"""

import os as _os

import jax

jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: blind-rotation scans are large programs and
# recompiling them per process dominates cold-start time.
_cache_dir = _os.environ.get(
    "MKTFHE_JAX_CACHE", _os.path.expanduser("~/.cache/mktfhe_jax")
)
try:
    _os.makedirs(_cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", _cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
except Exception:  # pragma: no cover - cache is best-effort
    pass

from . import ring  # noqa: E402

__version__ = "0.1.0"
