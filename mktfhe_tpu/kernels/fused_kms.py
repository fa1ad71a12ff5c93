"""Fused KMS phase-1 step kernel: one Pallas call per CMux per party.

Phase 1 of the KMS two-phase blind rotation (the reference's per-party
`phase_1`, /root/reference/src/tfhe/bootstrapping.jl:389-443) is the
throughput bottleneck at preset sizes: per step the batch-minor pipeline
round-trips digits, NTT stages, products, and reconstruction through HBM.
This kernel fuses the whole per-step pipeline --

    gadget-decompose the uint64 accumulator (as u32 limb pairs) ->
    lift to CRT residues -> forward NTT -> external product with the
    party's brk row -> monomial weight (X^a - 1) -> inverse NTT

-- into one Pallas call over a (prime, rlev-row, batch-tile) grid, with the
digit rows chunked through the unrolled butterfly stages so the scoped-VMEM
stack stays bounded at N=2048.  Garner reconstruction and the uint64
accumulate stay outside in XLA but as pure u32 limb-pair arithmetic (no
uint64 emulation anywhere in the scan carry).

Layout is batch-minor ([rows, N, G], gate batch on lanes) -- use batches
>= 128 to fill the vregs; at batch 8 the lanes are 94% padding.

Bit-identical to kms.phase1 / kms_phase1_bm (tests/test_fused_kms.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ring.context import RingCtx, make_ring_ctx
from .ntt_pallas import _fwd_body, _inv_body, _mulhi, _shoup, stage_tables, x32_trace

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


# ─── the fused step kernel ────────────────────────────────────────────────


def make_kms_step_kernel(params, ctx: RingCtx, iter_rows: int, g_tile: int, interpret: bool):
    """Build step(acc_lo, acc_hi, brk, brk_sh, mono, mono_sh) -> residues.

    acc_*: [iter_rows, 2, N, G]; brk: [npr, 2l, 2, N] (+ shoup);
    mono: [npr, N, G] (+ shoup).  Returns [npr, iter_rows, 2, N, G]
    residues of INTT(mono * (brk @ NTT(decomp(acc)))) -- the caller runs
    Garner + the u64 accumulate in XLA (u32 pair math, cheap and fusable).

    Grid (npr, iter_rows, G/gt): one program per (prime, rlev row, batch
    tile); digit rows stream through the unrolled butterflies in chunks of
    2 to bound the scoped-VMEM stack at N=2048.
    """
    n = ctx.n
    npr = ctx.nprimes
    l, log_b = params.l_gsw, params.log_b_gsw
    cpl = 2 * l
    (
        fwd_tw, fwd_sh, fwd_msk, shifts_fwd,
        inv_tw, inv_sh, inv_msk, shifts_inv,
        primes, ninvs, ninv_shs,
    ) = stage_tables(n, npr)
    s_count = len(shifts_fwd)

    def kernel(sc_ref, tw_ref, twsh_ref, msk_ref, itw_ref, itwsh_ref, imsk_ref,
               acc_lo_ref, acc_hi_ref, brk_ref, brks_ref, mono_ref, monos_ref,
               out_ref):
        # runtime prime index: tables index with q directly, so the program
        # is compiled ONCE for all primes (vs an npr-fold pl.when unroll,
        # which tripled Mosaic compile time)
        q = pl.program_id(0)
        p = sc_ref[0, q]  # u32 scalar from SMEM
        ninv = sc_ref[1, q]
        ninv_sh = sc_ref[2, q]
        # NOTE: scalar bitcast is rejected by Mosaic ('tpu.bitcast' wants
        # vectors); primes are < 2^31 so a value cast is bit-identical.
        pi32 = p.astype(jnp.int32)
        # digits for this row's two components, [2][l] of [N, Gt] i32
        digs = [
            _decomp_pairs(acc_lo_ref[0, c], acc_hi_ref[0, c], l, log_b)
            for c in range(2)
        ]
        # external product accumulators, one per output component
        eh = [None, None]
        # stream digit rows through the NTT two at a time
        for j0 in range(0, cpl, 2):
            rows = []
            for j in (j0, j0 + 1):
                d = digs[j // l][j % l]
                rows.append(jnp.where(d < 0, d + pi32, d).astype(U32))
            dr = jnp.stack(rows, axis=0)  # [2, N, Gt]
            dhat = _fwd_body(dr, tw_ref, twsh_ref, msk_ref, shifts_fwd, q, p, n)
            for cout in range(2):
                for jj, j in enumerate((j0, j0 + 1)):
                    w = brk_ref[0, j, cout][:, None]
                    w_s = brks_ref[0, j, cout][:, None]
                    prod = _shoup(w, w_s, dhat[jj], p)
                    if eh[cout] is None:
                        eh[cout] = prod
                    else:
                        s = eh[cout] + prod
                        eh[cout] = jnp.where(s >= p, s - p, s)
        ehs = jnp.stack(eh, axis=0)  # [2, N, Gt]
        mono = mono_ref[0][None]
        mono_s = monos_ref[0][None]
        w = _shoup(mono, mono_s, ehs, p)
        out_ref[0, 0] = _inv_body(
            w, itw_ref, itwsh_ref, imsk_ref, shifts_inv, q, p, n, ninv, ninv_sh
        )

    scalars = np.stack([
        np.asarray(primes, dtype=np.uint32),
        np.asarray(ninvs, dtype=np.uint32),
        np.asarray(ninv_shs, dtype=np.uint32),
    ])  # [3, npr]
    tabs = [
        jnp.asarray(scalars),
        jnp.asarray(fwd_tw), jnp.asarray(fwd_sh), jnp.asarray(fwd_msk),
        jnp.asarray(inv_tw), jnp.asarray(inv_sh), jnp.asarray(inv_msk),
    ]
    tab_specs = [
        pl.BlockSpec((3, npr), lambda q, r, b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((npr, s_count, n), lambda q, r, b: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((npr, s_count, n), lambda q, r, b: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((s_count, n), lambda q, r, b: (0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((npr, s_count, n), lambda q, r, b: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((npr, s_count, n), lambda q, r, b: (0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((s_count, n), lambda q, r, b: (0, 0), memory_space=pltpu.VMEM),
    ]

    def step(acc_lo, acc_hi, brk, brk_sh, mono, mono_sh):
        g = acc_lo.shape[-1]
        gt = g if g <= g_tile else max(128, (g_tile // 128) * 128)
        if g % gt != 0:
            gt = g
        return x32_trace(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(
                (npr, iter_rows, 2, n, g), jnp.uint32
            ),
            grid=(npr, iter_rows, g // gt),
            in_specs=tab_specs + [
                pl.BlockSpec((1, 2, n, gt), lambda q, r, b: (r, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, n, gt), lambda q, r, b: (r, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cpl, 2, n), lambda q, r, b: (q, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, cpl, 2, n), lambda q, r, b: (q, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, gt), lambda q, r, b: (q, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, n, gt), lambda q, r, b: (q, 0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, 2, n, gt), lambda q, r, b: (q, r, 0, 0, b), memory_space=pltpu.VMEM
            ),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        ))(*tabs, acc_lo, acc_hi, brk, brk_sh, mono, mono_sh)

    return step


def kms_phase1_fused(tildea_p, brk_p, brk_sh_p, phase1_keys, iter_rows: int, params, out_ctx: RingCtx, g_tile: int = 128, interpret: bool = False):
    """Drop-in for kernels.batchminor.kms_phase1_bm with the fused kernel.

    tildea_p: [G, n]; brk_p: [n, npr', 2l, 2, N] (bm layout).  Returns the
    party's lev key in the standard prime basis: [G, iter_rows, 2, npr, N].
    """
    from ..ciphertext.rlwe import gadget_gvec
    from ..ring.ntt import fwd_ntt
    from ..ring.torus import lift

    npr_p = brk_p.shape[1]
    ctx_p = make_ring_ctx(params.big_n, params.ring_torus_bits, npr_p)
    g = tildea_p.shape[0]
    n = params.big_n

    gvec = gadget_gvec(params.l_lev, params.log_b_lev, ctx_p.dtype)[:iter_rows]
    acc_lo = jnp.zeros((iter_rows, 2, n, g), dtype=U32)
    acc_hi = jnp.zeros((iter_rows, 2, n, g), dtype=U32)
    acc_lo = acc_lo.at[:, 0, 0, :].set((gvec & jnp.uint64(0xFFFFFFFF)).astype(U32)[:, None])
    acc_hi = acc_hi.at[:, 0, 0, :].set((gvec >> 32).astype(U32)[:, None])

    step_fn = make_kms_step_kernel(params, ctx_p, iter_rows, g_tile, interpret)

    def step(carry, xs):
        lo, hi = carry
        brk_h, brk_s, ta = xs
        mono = jnp.transpose(phase1_keys.mono_hat[ta], (1, 2, 0))
        mono_s = jnp.transpose(phase1_keys.mono_shoup[ta], (1, 2, 0))
        rs = step_fn(lo, hi, brk_h, brk_s, mono, mono_s)  # [npr, iter, 2, N, G]
        dlo, dhi = garner_pairs(rs, ctx_p)  # [iter, 2, N, G] pairs
        lo2, hi2 = _pair_add(lo, hi, dlo, dhi)
        return (lo2, hi2), None

    (acc_lo, acc_hi), _ = jax.lax.scan(
        step, (acc_lo, acc_hi), (brk_p, brk_sh_p, tildea_p.T)
    )
    acc = acc_lo.astype(jnp.uint64) | (acc_hi.astype(jnp.uint64) << 32)
    acc_std = jnp.transpose(acc, (3, 0, 1, 2))  # [G, rows, 2, N]
    return fwd_ntt(lift(acc_std, out_ctx.crt), out_ctx.plan)


@functools.partial(jax.jit, static_argnames=("params", "interpret", "pallas_ntt"))
def bootstrap_fused_kms(ct, scheme, phase1_keys, params, interpret: bool = False, pallas_ntt: bool = False):
    """KMS bootstrap with the fused phase-1 step kernel.

    Same key material as kms.bootstrap_bm (BmKmsPhase1 + KmsScheme);
    bit-identical outputs.
    """
    from ..schemes.common import initial_acc, mod_switch_2n
    from ..schemes.kms import _ctx, _keyswitch, _phase2_party
    from ..schemes.params import KmsBlockParams

    assert not isinstance(params, KmsBlockParams), (
        "the fused phase-1 kernel implements the binary-key rotation; use "
        "kms.bootstrap(..., pallas_ntt=True) for block presets"
    )
    ctx = _ctx(params)
    k = params.k
    tildeb, tildea = mod_switch_2n(ct, params.big_n)
    g = tildea.shape[0]
    tild = jnp.moveaxis(tildea.reshape(g, k, params.n), 1, 0)  # [k, G, n]

    # party 1 needs a single RLEV row (its rotation hits the test vector
    # directly in phase 2 -- the reference's iter=1 special case at
    # bootstrapping.jl:400); the rest carry l_lev rows and run under
    # lax.map so their identical phase-1 program compiles ONCE, not k-1
    # times (the per-party python loop dominated compile time at k=8).
    lev0 = kms_phase1_fused(
        tild[0], phase1_keys.brk_bm[0], phase1_keys.brk_bm_shoup[0],
        phase1_keys, 1, params, ctx, interpret=interpret,
    )
    if k > 1:
        lev_rest = jax.lax.map(
            lambda xs: kms_phase1_fused(
                xs[0], xs[1], xs[2], phase1_keys, params.l_lev, params, ctx,
                interpret=interpret,
            ),
            (tild[1:], phase1_keys.brk_bm[1:], phase1_keys.brk_bm_shoup[1:]),
        )
        levkeys = [lev0] + [lev_rest[i] for i in range(k - 1)]
    else:
        levkeys = [lev0]

    acc = initial_acc(tildeb, params.big_n, k, ctx.dtype)
    for p1 in range(1, k + 1):
        iter_rows = 1 if p1 == 1 else params.l_lev
        acc = _phase2_party(
            acc, levkeys[p1 - 1][:, :iter_rows], p1, scheme, params, ctx,
            pallas_ntt=pallas_ntt, interpret=interpret,
        )
    return _keyswitch(acc, scheme, params)
