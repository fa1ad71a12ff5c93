"""Noise-budget measurement: empirical phase-error statistics.

The reference validates noise only implicitly (an exhausted budget shows up
as a failed end-to-end assert, SURVEY.md section 4).  Because this
framework's arithmetic is exact, *all* observed phase error comes from the
scheme's own noise terms (encryption noise, decomposition rounding,
modulus-switch rounding) -- so measured margins directly validate parameter
sets, including the float-free path's slightly different rounding vs the
reference's Float64 pipeline (SURVEY.md "hard parts" item 4).

The margin of a binary TFHE ciphertext is 1/16 of the torus (distance from
the +-1/8 message centers to the decision boundary); `margin_sigmas` is
how many noise stddevs fit in that margin -- e.g. > 6 means per-gate error
probability < ~1e-9.
"""

from __future__ import annotations

import numpy as np

from ..ciphertext.lwe import Lwe
from ..ciphertext.keys import LweKey


def phase_error_bits(out: Lwe, keys: list[LweKey], want: np.ndarray) -> np.ndarray:
    """Signed phase error (in torus units) of bootstrapped ciphertexts
    against the ideal +-1/8 encodings of `want`."""
    t = out.b.dtype.itemsize * 8
    n = keys[0].n
    ph = np.asarray(out.b).astype(np.uint64)
    a = np.asarray(out.a)
    for i, key in enumerate(keys):
        seg = a[..., i * n : (i + 1) * n].astype(np.uint64)
        ph = (ph + (seg * np.asarray(key.key).astype(np.uint64)).sum(axis=-1)) % (
            1 << t
        )
    ideal = np.where(want, 1 << (t - 3), (1 << t) - (1 << (t - 3))).astype(np.uint64)
    err = (ph - ideal) % np.uint64(1 << t)
    return np.where(err >= 1 << (t - 1), err.astype(np.int64) - (1 << t), err).astype(
        np.int64
    )


def noise_report(out: Lwe, keys: list[LweKey], want: np.ndarray) -> dict:
    """Summary statistics of bootstrap output noise."""
    t = out.b.dtype.itemsize * 8
    err = phase_error_bits(out, keys, want).astype(np.float64)
    std = float(err.std())
    margin = float(1 << (t - 4))  # 1/16 torus to the decision boundary
    return {
        "samples": int(err.size),
        "std_bits": float(np.log2(std)) if std > 0 else 0.0,
        "max_abs_bits": float(np.log2(np.abs(err).max() + 1)),
        "margin_bits": float(np.log2(margin)),
        "margin_sigmas": margin / std if std > 0 else float("inf"),
    }
