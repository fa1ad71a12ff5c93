"""Pallas TPU kernel: fused negacyclic NTT (all butterfly stages in VMEM).

The jnp NTT (ring/ntt.py) materializes every butterfly stage through HBM
and runs butterflies across the lane dimension (N minor), which forces
lane shuffles.  This kernel uses the TPU-native layout: the *batch* is the
minor (lane) dimension and N lives on sublanes, and each butterfly stage
is two circular rolls along the N axis plus elementwise selects --
  partner[i] = a[i XOR t] = where(bit_t(i), roll(a, t), roll(a, -t))
-- with per-position twiddle/mask tables precomputed per stage.  No
reshapes or stacks touch tiled dimensions inside the kernel (Mosaic
supports rolls and elementwise ops on any stride), and all log2(N) stages
run out of VMEM in one launch.

Grid: one program per batch tile; the 2-4 CRT primes are a static loop
inside the kernel.  Bit-identical to ring/ntt.py (same merged-twist CT/GS
formulation, eprint 2016/504) -- tests/test_pallas.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ring.modring import shoup
from ..ring.ntt import NttPlan

U32 = jnp.uint32


def x32_trace(fn):
    """Trace `fn` (a pallas_call invocation) with x64 disabled.

    All kernels here are pure uint32 in/out, but under jax_enable_x64 the
    BlockSpec index maps trace to i64 scalars, which the TPU runtime's
    Mosaic pipeline fails to legalize ("func.return (i64, i64, i64)").
    Disabling x64 for the trace only changes those index dtypes."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        with jax.enable_x64(False):
            return fn(*args, **kwargs)

    return wrapper


def _mulhi(x, y):
    m16 = U32(0xFFFF)
    x0 = x & m16
    x1 = x >> 16
    y0 = y & m16
    y1 = y >> 16
    ll = x0 * y0
    hl = x1 * y0
    lh = x0 * y1
    hh = x1 * y1
    cross = (ll >> 16) + (hl & m16) + lh
    return hh + (hl >> 16) + (cross >> 16)


def _shoup(w, w_sh, a, p):
    q = _mulhi(w_sh, a)
    r = w * a - q * p
    return jnp.where(r >= p, r - p, r)


def _shoup_lazy(w, w_sh, a, p):
    """Shoup multiply without the final correction: result in [0, 2p).

    Exact mod p for any a < 2^32 (the quotient estimate is off by at most
    one).  Feeding lazy (< 4p) values is fine."""
    return w * a - _mulhi(w_sh, a) * p


def _shoup_lazy3(w, w_sh, a, p):
    """Shoup multiply with a 3-multiply APPROXIMATE mulhi: result in
    [0, 3p), congruent to w*a mod p, for any a < 2^32.

    The exact mulhi is four 16x16 partial products; dropping the
    low-low product ll = w_sh.lo * a.lo can only lower the quotient
    estimate, and by at most 1 (ll >> 16 < 2^16 added into a value whose
    floor-div by 2^16 is taken).  Combined with the lazy estimate's own
    -1, the quotient is off by at most 2 below, so r = w*a - q*p lands in
    [0, 3p).  Valid because modring.PRIMES satisfy 6p < 2^32: a single
    result fits easily and two results sum without u32 overflow.

    Saves 1 multiply + 2 adds/shifts per call vs _shoup_lazy; the caller
    pays for the looser bound with conditional subtractions only where an
    invariant needs them.
    """
    m16 = U32(0xFFFF)
    x0 = w_sh & m16
    x1 = w_sh >> 16
    y0 = a & m16
    y1 = a >> 16
    hl = x1 * y0
    lh = x0 * y1
    q = x1 * y1 + (hl >> 16) + ((lh + (hl & m16)) >> 16)
    return w * a - q * p


@functools.lru_cache(maxsize=None)
def stage_tables(n: int, nprimes: int):
    """Per-stage full-length tables for the roll+select butterflies.

    Returns numpy arrays:
      fwd_tw, fwd_tw_sh: [npr, S, N] twiddles broadcast to every position
      inv_tw, inv_tw_sh: [npr, S, N] (inverse; last stage folds 1/N)
      fwd_mask, inv_mask: [S, N] uint32 (1 where bit_t(i) is set)
      shifts_fwd, shifts_inv: python lists of per-stage strides t
    """
    from ..ring.ntt import make_plan

    plan = make_plan(n, nprimes)
    s_count = n.bit_length() - 1
    idx = np.arange(n)

    fwd_tw = np.zeros((nprimes, s_count, n), dtype=np.uint32)
    fwd_msk = np.zeros((s_count, n), dtype=np.uint32)
    shifts_fwd = []
    m = 1
    t = n
    for s in range(s_count):
        t //= 2
        logt = t.bit_length() - 1
        blk = idx >> (logt + 1)
        for q in range(nprimes):
            fwd_tw[q, s] = plan.psi_brv[q][m + blk]
        fwd_msk[s] = (idx >> logt) & 1
        shifts_fwd.append(t)
        m *= 2

    inv_tw = np.zeros((nprimes, s_count, n), dtype=np.uint32)
    inv_msk = np.zeros((s_count, n), dtype=np.uint32)
    shifts_inv = []
    t = 1
    m = n
    for s in range(s_count):
        h = m // 2
        logt = t.bit_length() - 1
        blk = idx >> (logt + 1)
        for q in range(nprimes):
            inv_tw[q, s] = plan.ipsi_brv[q][h + blk]
        inv_msk[s] = (idx >> logt) & 1
        shifts_inv.append(t)
        t *= 2
        m = h

    # fold N^{-1} into the last inverse stage's twiddles AND supply it for
    # the u-half (which is otherwise unscaled): handled by a final scale
    # table instead -- simpler: keep a separate [npr] n_inv pair.
    primes = [int(p) for p in plan.primes]
    fwd_sh = np.zeros_like(fwd_tw)
    inv_sh = np.zeros_like(inv_tw)
    for q in range(nprimes):
        p = primes[q]
        fwd_sh[q] = ((fwd_tw[q].astype(object) << 32) // p).astype(np.uint64).astype(np.uint32)
        inv_sh[q] = ((inv_tw[q].astype(object) << 32) // p).astype(np.uint64).astype(np.uint32)
    return (
        fwd_tw, fwd_sh, np.asarray(fwd_msk), shifts_fwd,
        inv_tw, inv_sh, np.asarray(inv_msk), shifts_inv,
        primes,
        [int(v) for v in plan.n_inv],
        [int(v) for v in plan.n_inv_shoup],
    )


def _roll_n(a, shift: int, n: int):
    """Circular roll along the N axis (-2) by a static shift (non-negative,
    int32: tpu.dynamic_rotate rejects the i64 scalars x64 mode produces)."""
    return pltpu.roll(a, jnp.int32(shift % n), axis=a.ndim - 2)


def _fwd_body(a, tw_ref, tw_sh_ref, msk_ref, shifts, q: int, p, n: int):
    """Forward transform for one prime; a: [..., N, Gt] values < p.

    tw_ref/tw_sh_ref: refs (or arrays) indexable as [q, s] -> [N];
    msk_ref as [s] -> [N].

    Harvey-style lazy butterflies: the in-flight invariant is < 4p
    (primes are < 2^30 so 4p fits uint32); only the u-half is reduced to
    < 2p per stage, the Shoup multiply skips its correction (valid for any
    operand < 2^32), and a two-step canonical reduction runs once at exit.
    Output bit-identical to the eager form, ~30% fewer vector ops.
    """
    two_p = p + p
    for s, t in enumerate(shifts):
        tw = tw_ref[q, s][:, None]
        tw_sh = tw_sh_ref[q, s][:, None]
        msk = msk_ref[s][:, None]
        is_v = msk != 0
        partner = jnp.where(is_v, _roll_n(a, t, n), _roll_n(a, -t, n))
        u = jnp.where(is_v, partner, a)
        v = jnp.where(is_v, a, partner)
        u = jnp.where(u >= two_p, u - two_p, u)  # < 2p
        vw = _shoup_lazy(tw, tw_sh, v, p)  # < 2p
        a = u + jnp.where(is_v, two_p - vw, vw)  # hi/lo, both < 4p
    a = jnp.where(a >= two_p, a - two_p, a)
    return jnp.where(a >= p, a - p, a)


def _inv_body(a, tw_ref, tw_sh_ref, msk_ref, shifts, q: int, p, n: int, ninv, ninv_sh):
    """Gentleman-Sande inverse, lazy form (see _fwd_body): in-flight
    invariant < 2p, canonical output via the final 1/N Shoup multiply."""
    two_p = p + p
    for s, t in enumerate(shifts):
        tw = tw_ref[q, s][:, None]
        tw_sh = tw_sh_ref[q, s][:, None]
        msk = msk_ref[s][:, None]
        is_v = msk != 0
        partner = jnp.where(is_v, _roll_n(a, t, n), _roll_n(a, -t, n))
        u = jnp.where(is_v, partner, a)
        v = jnp.where(is_v, a, partner)
        hi = u + v  # < 4p
        hi = jnp.where(hi >= two_p, hi - two_p, hi)  # < 2p
        d = u + (two_p - v)  # < 4p; the lazy Shoup absorbs it
        lo = _shoup_lazy(tw, tw_sh, d, p)  # < 2p
        a = jnp.where(is_v, lo, hi)
    a = _shoup_lazy(ninv, ninv_sh, a, p)  # < 2p
    return jnp.where(a >= p, a - p, a)


def _pick_r_tile(r_dim: int, n: int, g_tile: int, budget_bytes: int = 2 << 20):
    """Largest divisor of r_dim whose [r_tile, N, Gt] u32 block stays under
    the budget (the scoped-vmem stack must also hold the unrolled stage
    temporaries, ~6x the live block).  Lanes are padded to a full vreg
    width, so a small G still costs 128 lanes per temporary."""
    eff_g = ((g_tile + 127) // 128) * 128
    best = 1
    for r_tile in range(1, r_dim + 1):
        if r_dim % r_tile == 0 and r_tile * n * eff_g * 4 <= budget_bytes:
            best = r_tile
    return best


def _make_call(plan: NttPlan, x, g_tile: int, interpret: bool, forward: bool):
    npr, r_dim, n, g = x.shape
    assert npr == plan.nprimes and n == plan.n
    assert g % g_tile == 0
    (
        fwd_tw, fwd_sh, fwd_msk, shifts_fwd,
        inv_tw, inv_sh, inv_msk, shifts_inv,
        primes, ninvs, ninv_shs,
    ) = stage_tables(n, npr)
    s_count = len(shifts_fwd)
    r_tile = _pick_r_tile(r_dim, n, g_tile)

    def kernel(tw_ref, twsh_ref, msk_ref, x_ref, o_ref):
        q = pl.program_id(0)
        for qs in range(npr):

            @pl.when(q == qs)
            def _():
                p = U32(primes[qs])
                a = x_ref[0]
                if forward:
                    out = _fwd_body(a, tw_ref, twsh_ref, msk_ref, shifts_fwd, qs, p, n)
                else:
                    out = _inv_body(
                        a, tw_ref, twsh_ref, msk_ref, shifts_inv, qs, p, n,
                        U32(ninvs[qs]), U32(ninv_shs[qs]),
                    )
                o_ref[0, :, :, :] = out

    tw = fwd_tw if forward else inv_tw
    tw_s = fwd_sh if forward else inv_sh
    msk = fwd_msk if forward else inv_msk
    return x32_trace(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(npr, r_dim // r_tile, g // g_tile),
        in_specs=[
            pl.BlockSpec((npr, s_count, n), lambda q, r, b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npr, s_count, n), lambda q, r, b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_count, n), lambda q, r, b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (1, r_tile, n, g_tile), lambda q, r, b: (q, r, 0, b), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, r_tile, n, g_tile), lambda q, r, b: (q, r, 0, b), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    ))(jnp.asarray(tw), jnp.asarray(tw_s), jnp.asarray(msk), x)


def fwd_ntt_pallas(x, plan: NttPlan, g_tile: int = 128, interpret: bool = False):
    """Forward NTT in batch-minor layout: x [npr, R, N, G] -> [npr, R, N, G]."""
    return _make_call(plan, jnp.asarray(x), g_tile, interpret, forward=True)


def inv_ntt_pallas(x, plan: NttPlan, g_tile: int = 128, interpret: bool = False):
    """Inverse NTT in batch-minor layout."""
    return _make_call(plan, jnp.asarray(x), g_tile, interpret, forward=False)


# ─── Natural-layout kernel ("layout B") ──────────────────────────────────
#
# Mosaic requires the last two block dims divisible by (8, 128).  Flattening
# the prime axis into the minor dimension -- [rows, npr*N] -- satisfies this
# for any N >= 128 without transposing anything: [..., npr, N] arrays are
# contiguous in exactly this layout.  Rows (the flattened batch) pad to 8.
# Butterflies roll along the minor axis inside each prime's N-slice.


def _nat_body(a_slice, tw, tw_sh, msk, shifts, p, n, forward, ninv=None, ninv_sh=None):
    """One prime's transform; a_slice [rows, N] (N minor); tables [S, N]."""
    for s, t in enumerate(shifts):
        tws = tw[s][None, :]
        tws_sh = tw_sh[s][None, :]
        is_v = msk[s][None, :] != 0
        rolled_p = pltpu.roll(a_slice, jnp.int32(t % n), axis=1)
        rolled_m = pltpu.roll(a_slice, jnp.int32((-t) % n), axis=1)
        partner = jnp.where(is_v, rolled_p, rolled_m)
        u = jnp.where(is_v, partner, a_slice)
        v = jnp.where(is_v, a_slice, partner)
        if forward:
            vw = _shoup(tws, tws_sh, v, p)
            hi = u + vw
            hi = jnp.where(hi >= p, hi - p, hi)
            lo = u + (p - vw)
            lo = jnp.where(lo >= p, lo - p, lo)
        else:
            hi = u + v
            hi = jnp.where(hi >= p, hi - p, hi)
            d = u + (p - v)
            d = jnp.where(d >= p, d - p, d)
            lo = _shoup(tws, tws_sh, d, p)
        a_slice = jnp.where(is_v, lo, hi)
    if not forward:
        a_slice = _shoup(ninv, ninv_sh, a_slice, p)
    return a_slice


def _nat_call(plan: NttPlan, x, r_tile: int, interpret: bool, forward: bool):
    """x: [R, npr*N] uint32; R divisible by r_tile (r_tile % 8 == 0)."""
    npr, n = plan.nprimes, plan.n
    r_all = x.shape[0]
    (
        fwd_tw, fwd_sh, fwd_msk, shifts_fwd,
        inv_tw, inv_sh, inv_msk, shifts_inv,
        primes, ninvs, ninv_shs,
    ) = stage_tables(n, npr)
    tw = fwd_tw if forward else inv_tw
    tw_s = fwd_sh if forward else inv_sh
    msk = fwd_msk if forward else inv_msk
    shifts = shifts_fwd if forward else shifts_inv
    # pad the stage axis to a sublane multiple (Mosaic tiling constraint)
    s_pad = (-len(shifts)) % 8
    if s_pad:
        zt = np.zeros((npr, s_pad, n), dtype=np.uint32)
        zm = np.zeros((s_pad, n), dtype=np.uint32)
        tw = np.concatenate([tw, zt], axis=1)
        tw_s = np.concatenate([tw_s, zt], axis=1)
        msk = np.concatenate([msk, zm], axis=0)
    s_count = len(shifts) + s_pad

    def kernel(tw_ref, twsh_ref, msk_ref, x_ref, o_ref):
        for q in range(npr):
            p = U32(primes[q])
            sl = x_ref[:, q * n : (q + 1) * n]
            out = _nat_body(
                sl, tw_ref[q], twsh_ref[q], msk_ref, shifts, p, n, forward,
                U32(ninvs[q]), U32(ninv_shs[q]),
            )
            o_ref[:, q * n : (q + 1) * n] = out

    return x32_trace(pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(r_all // r_tile,),
        in_specs=[
            pl.BlockSpec((npr, s_count, n), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npr, s_count, n), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((s_count, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((r_tile, npr * n), lambda b: (b, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (r_tile, npr * n), lambda b: (b, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    ))(jnp.asarray(tw), jnp.asarray(tw_s), jnp.asarray(msk), x)


def _nat_transform(a, plan: NttPlan, forward: bool, r_tile: int, interpret: bool):
    """a: [..., npr, N] -> same, transformed; natural layout, no transposes."""
    npr, n = plan.nprimes, plan.n
    lead = a.shape[:-2]
    import math

    r_all = math.prod(lead) if lead else 1
    x = a.reshape(r_all, npr * n)
    # shrink the row tile for small batches (pad to sublanes, not to 256)
    r_tile = min(r_tile, ((r_all + 7) // 8) * 8)
    pad = (-r_all) % r_tile
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad, npr * n), x.dtype)], axis=0)
    y = _nat_call(plan, x, r_tile, interpret, forward)
    if pad:
        y = y[:r_all]
    return y.reshape(*lead, npr, n)


def fwd_ntt_nat(a, plan: NttPlan, r_tile: int = 256, interpret: bool = False):
    """Drop-in Pallas replacement for ring.ntt.fwd_ntt ([..., npr, N])."""
    return _nat_transform(jnp.asarray(a), plan, True, r_tile, interpret)


def inv_ntt_nat(a, plan: NttPlan, r_tile: int = 256, interpret: bool = False):
    """Drop-in Pallas replacement for ring.ntt.inv_ntt ([..., npr, N])."""
    return _nat_transform(jnp.asarray(a), plan, False, r_tile, interpret)
