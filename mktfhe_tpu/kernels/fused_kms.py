"""u32 limb-pair arithmetic, gadget decomposition, and balanced Garner
for the Pallas KMS kernels (uint64 torus math without uint64 lanes).

Historically this module also hosted the round-1 "fk" fused per-step
engine (one pallas_call per CMux); that engine was retired in round 5
once the whole-rotation mx3 engine covered every preset (wide gadgets,
block variants, no-stored-Shoup keys) -- the surviving engines are the
jnp reference path, the pallas-NTT batch-minor engine, mx2 (golden
anchor), and mx3 (production).  The helpers here are the shared exact
building blocks of mx2/mx3:

* `_pair_*`: uint64 arithmetic as u32 (lo, hi) limb planes;
* `_decomp_pairs` / `_decomp_pairs_bias`: the reference's balanced
  gadget decomposition (gsw.jl:42-64) on limb pairs -- the bias variant
  folds the rounding and inter-digit carries into one constant add;
* `garner_pairs`: balanced Garner reconstruction mod 2^64
  (ring/torus.from_crt_u64 evaluated in limb pairs).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from ..ring.context import RingCtx
from .ntt_pallas import _mulhi, _shoup

U32 = jnp.uint32


# ─── u32 limb-pair arithmetic (uint64 without uint64) ────────────────────


def _pair_add(lo, hi, blo, bhi):
    """(lo, hi) + (blo, bhi) mod 2^64."""
    slo = lo + blo
    carry = (slo < lo).astype(U32)
    return slo, hi + bhi + carry


def _pair_sub(lo, hi, blo, bhi):
    """(lo, hi) - (blo, bhi) mod 2^64."""
    slo = lo - blo
    borrow = (lo < blo).astype(U32)
    return slo, hi - bhi - borrow


def _pair_add_u32(lo, hi, c):
    """(lo, hi) + c (u32) mod 2^64."""
    slo = lo + c
    return slo, hi + (slo < lo).astype(U32)


def _pair_sub_const(lo, hi, clo: int, chi: int):
    """(lo, hi) - constant mod 2^64."""
    slo = lo - U32(clo)
    borrow = (lo < U32(clo)).astype(U32)
    return slo, hi - U32(chi) - borrow


def _pair_shr(lo, hi, s: int):
    """(lo, hi) >> s (logical), 0 < s < 64, static."""
    if s == 0:
        return lo, hi
    if s < 32:
        return (lo >> s) | (hi << (32 - s)), hi >> s
    if s == 32:
        return hi, jnp.zeros_like(hi)
    return hi >> (s - 32), jnp.zeros_like(hi)


def _pair_bit(lo, hi, i: int):
    """Bit i of the pair as u32 in {0, 1} (static i)."""
    return (lo >> i) & U32(1) if i < 32 else (hi >> (i - 32)) & U32(1)


def _decomp_pairs(lo, hi, l: int, log_b: int):
    """Balanced gadget decomposition of a uint64 held as u32 limbs.

    Mirrors ciphertext.decomp.balanced_decomp on uint64 (T=64) exactly:
    round-to-nearest shift by low = 64 - l*log_b, then l digits in
    [-B/2, B/2) with carry propagation, most-significant level first in
    the returned list's natural order (index j <-> gadget 2^(64-(j+1)logB)).
    """
    low = 64 - l * log_b
    if low > 0:
        carry = _pair_bit(lo, hi, low - 1)
        alo, ahi = _pair_shr(lo, hi, low)
        alo, ahi = _pair_add_u32(alo, ahi, carry)
    else:
        alo, ahi = lo, hi
    mask = U32((1 << log_b) - 1)
    half = U32(1 << (log_b - 1))
    digs = []
    for lev in range(l, 0, -1):
        d = alo & mask
        if lev > 1:
            alo, ahi = _pair_shr(alo, ahi, log_b)
            alo, ahi = _pair_add_u32(alo, ahi, d >> (log_b - 1))
        ds = d - ((d & half) << 1)
        digs.append(jax.lax.bitcast_convert_type(ds, jnp.int32))
    digs.reverse()
    return digs


def _decomp_pairs_bias(lo, hi, l: int, log_b: int):
    """_decomp_pairs via the bias trick: ONE constant pair-add implements
    the rounding carry and every inter-digit carry at once, then the l
    digits extract independently (no sequential carry chain).

    bias = 2^(low-1) + sum_j (B/2) * 2^(low + j*log_b); digit j =
    ((a + bias) >> (low + j*log_b)) & mask, minus B/2.  Bit-identical to
    _decomp_pairs for every input (tests/test_fused.py) -- both drop
    carries beyond bit 64.  Saves ~40% of the decomposition's lane ops
    and removes the loop-carried dependency.
    """
    low = 64 - l * log_b
    half = 1 << (log_b - 1)
    bias = (1 << (low - 1)) if low > 0 else 0
    for j in range(l):
        bias += half << (low + j * log_b)
    bias &= (1 << 64) - 1
    blo, bhi = U32(bias & 0xFFFFFFFF), U32((bias >> 32) & 0xFFFFFFFF)
    slo = lo + blo
    carry = (slo < lo).astype(U32)
    shi = hi + bhi + carry
    mask = jnp.int32((1 << log_b) - 1)
    digs = []
    for jj in range(l):
        # _decomp_pairs returns most-significant level first: its index 0
        # pairs with gadget 2^(64 - log_b), i.e. the TOP digit, which
        # lives at bit offset low + (l-1)*log_b.
        s = low + (l - 1 - jj) * log_b
        d = _pair_shr(slo, shi, s)[0] if s else slo
        ds = jax.lax.bitcast_convert_type(d, jnp.int32) & mask
        digs.append(ds - jnp.int32(half))
    return digs


def garner_pairs(rs, ctx: RingCtx):
    """Balanced Garner of per-prime residues -> uint64 as (lo, hi) planes.

    rs: [npr, ..., N, G] u32 (or a list of per-prime arrays).  Exact
    counterpart of ring.torus.from_crt_u64 evaluated in u32 limb pairs.
    """
    plan = ctx.crt
    primes = [int(p) for p in np.asarray(plan.primes)]
    m = len(primes)
    t = [rs[0]]
    for i in range(1, m):
        u = rs[i]
        pi = U32(primes[i])
        two_p = pi + pi
        for j in range(i):
            w, w_sh = plan.inv_pj[i][j]
            tj = t[j]
            tj = jnp.where(tj >= two_p, tj - two_p, tj)
            tj = jnp.where(tj >= two_p, tj - two_p, tj)
            tj = jnp.where(tj >= pi, tj - pi, tj)
            d = u + (pi - tj)
            d = jnp.where(d >= pi, d - pi, d)
            u = _shoup(U32(w), U32(w_sh), d, pi)
        t.append(u)
    xlo = t[-1]
    xhi = jnp.zeros_like(xlo)
    for i in range(m - 2, -1, -1):
        p = U32(primes[i])
        mlo = p * xlo
        mhi = _mulhi(p, xlo) + p * xhi
        xlo = mlo + t[i]
        xhi = mhi + (xlo < mlo).astype(U32)
    neg = t[-1] >= U32(primes[-1] // 2)
    prod = plan.prod_mod64
    slo, shi = _pair_sub_const(xlo, xhi, prod & 0xFFFFFFFF, (prod >> 32) & 0xFFFFFFFF)
    return jnp.where(neg, slo, xlo), jnp.where(neg, shi, xhi)
