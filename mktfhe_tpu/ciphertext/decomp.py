"""Gadget (digit) decomposition -- the blind-rotation inner-loop primitive.

Counterpart of /root/reference/src/ciphertext/gsw.jl:22-110 and
unienc.jl:4-18.  Two variants, both fully vectorized over arbitrary leading
axes (the reference loops over coefficients and levels):

  * `balanced_decomp`: signed digits in [-B/2, B/2) with carry propagation
    (gsw.jl:42-52), used before external products; small signed digits keep
    the CRT range tight.
  * `unbalanced_decomp`: plain non-negative digits in [0, B)
    (gsw.jl:34-40), used by the table-free key-switch matmul.

Digit index convention: output axis -2 has length l with index j
corresponding to gadget entry g_j = 2^(T - (j+1)*logB) (the reference's
1-based gvec, lev.jl:12-19).

Note: the reference's scalar-matrix balanced variant has a latent sign-fold
bug (gsw.jl:63 applies the fold to `ai` instead of the stored digit); that
path is dead code there and is implemented correctly here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ring.torus import bits_of, divbits


def _to_i32(d):
    """Reinterpret wrapped small signed values stored in a uint dtype."""
    if d.dtype == jnp.uint32:
        return jax.lax.bitcast_convert_type(d, jnp.int32)
    return jax.lax.bitcast_convert_type(d, jnp.int64).astype(jnp.int32)


def balanced_decomp(a, l: int, log_b: int):
    """Signed digit decomposition; a uint [...], returns int32 [..., l].

    sum_j digits[j] * 2^((l-1-j)*logB) == round(a / 2^(T - l*logB))
    (mod 2^(l*logB)), with digits in [-B/2, B/2); the top digit's carry-out
    wraps away mod 2^T, so the gadget identity
    sum_j digits[j] * g_j == round(a / 2^low) * 2^low (mod 2^T) is exact
    (matching gsw.jl:42-52 including the top-digit fold at :50-51).
    """
    t = bits_of(a.dtype)
    low = t - l * log_b
    assert low >= 0
    ai = divbits(a, low) if low > 0 else a
    one = jnp.ones((), dtype=a.dtype)
    mask = (one << log_b) - one
    half_b = one << (log_b - 1)
    digs = []
    for lev in range(l, 0, -1):
        d = ai & mask
        if lev > 1:
            ai = (ai >> log_b) + (d >> (log_b - 1))
        ds = d - ((d & half_b) << 1)
        digs.append(_to_i32(ds))
    digs.reverse()
    return jnp.stack(digs, axis=-1)


def unbalanced_decomp(a, l: int, log_b: int):
    """Non-negative digit decomposition; a uint [...], returns int32 [..., l]."""
    t = bits_of(a.dtype)
    low = t - l * log_b
    assert low >= 0
    ai = divbits(a, low) if low > 0 else a
    one = jnp.ones((), dtype=a.dtype)
    mask = (one << log_b) - one
    digs = []
    for _ in range(l):
        digs.append(_to_i32(ai & mask))
        ai = ai >> log_b
    digs.reverse()
    return jnp.stack(digs, axis=-1)
