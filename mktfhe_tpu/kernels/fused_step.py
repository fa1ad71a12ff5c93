"""Fully fused blind-rotation step: one Pallas kernel per CMux.

The entire per-step pipeline of the CGGI blind rotation --

    gadget-decompose acc -> lift to CRT residues -> forward NTT ->
    external product with brk_i -> monomial weight (X^a - 1) ->
    inverse NTT -> Garner reconstruction -> acc += delta

-- runs in a single kernel with every intermediate resident in VMEM
(batch-minor layout: gate batch on lanes, N on sublanes).  This is the
"native-grade" counterpart of the reference's hand-unrolled SIMD FFT hot
loop (/root/reference/src/ring/fft.jl:105-210 driven by
bootstrapping.jl:47-75), fused one level higher than the reference could
(the whole CMux, not just the transform).

Verified bit-identical to both other engines (tests/test_fused.py).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ciphertext.lwe import Lwe
from ..ring.context import RingCtx, make_ring_ctx
from .ntt_pallas import _fwd_body, _inv_body, _shoup, stage_tables, x32_trace

U32 = jnp.uint32


def _decomp_signed(a, l: int, log_b: int, t_bits: int):
    """Balanced gadget decomposition on uint32 values (ciphertext/decomp.py
    inlined for the kernel; returns a list of l int32 digit arrays,
    most-significant level first)."""
    low = t_bits - l * log_b
    if low > 0:
        carry = (a << (t_bits - low)) >> (t_bits - 1)
        ai = (a >> low) + carry
    else:
        ai = a
    mask = U32((1 << log_b) - 1)
    half = U32(1 << (log_b - 1))
    digs = []
    for lev in range(l, 0, -1):
        d = ai & mask
        if lev > 1:
            ai = (ai >> log_b) + (d >> (log_b - 1))
        ds = d - ((d & half) << 1)
        digs.append(jax.lax.bitcast_convert_type(ds, jnp.int32))
    digs.reverse()
    return digs


def _garner_u32(rs, primes):
    """Balanced Garner across per-prime results rs[q] (uint32 arrays)."""
    from ..ring.torus import make_crt_plan

    plan = make_crt_plan(len(primes))
    t = [rs[0]]
    for i in range(1, len(primes)):
        u = rs[i]
        for j in range(i):
            w, w_sh = plan.inv_pj[i][j]
            pi = U32(primes[i])
            two_p = pi + pi
            tj = t[j]
            tj = jnp.where(tj >= two_p, tj - two_p, tj)
            tj = jnp.where(tj >= two_p, tj - two_p, tj)
            tj = jnp.where(tj >= pi, tj - pi, tj)
            d = u + (pi - tj)
            d = jnp.where(d >= pi, d - pi, d)
            u = _shoup(U32(w), U32(w_sh), d, pi)
        t.append(u)
    x = t[-1]
    for i in range(len(primes) - 2, -1, -1):
        x = t[i] + U32(primes[i]) * x
    neg = t[-1] >= U32(primes[-1] // 2)
    return jnp.where(neg, x - U32(plan.prod_mod32), x)


def make_cggi_step_kernel(params, ctx: RingCtx, g_tile: int, interpret: bool):
    """Build the fused step function: (acc [2,N,G], brk [npr,2l,2,N] x2,
    mono [npr,N,G] x2) -> new acc."""
    n = ctx.n
    npr = ctx.nprimes
    l, log_b = params.l_gsw, params.log_b_gsw
    cpl = 2 * l  # cin * l
    (
        fwd_tw, fwd_sh, fwd_msk, shifts_fwd,
        inv_tw, inv_sh, inv_msk, shifts_inv,
        primes, ninvs, ninv_shs,
    ) = stage_tables(n, npr)
    s_count = len(shifts_fwd)

    def kernel(tw_ref, twsh_ref, msk_ref, itw_ref, itwsh_ref, imsk_ref, acc_ref, brk_ref, brks_ref, mono_ref, monos_ref, out_ref):
        acc = acc_ref[:]  # [2, N, Gt]
        gt = acc.shape[-1]
        # decompose both components: digits[j][c] for level j, comp c
        digs = [
            _decomp_signed(acc[c], l, log_b, 32) for c in range(2)
        ]  # [2][l] of [N, Gt] int32
        rs = []
        for q in range(npr):
            p = U32(primes[q])
            pi32 = jnp.int32(primes[q])
            # lift + stack digit rows [cpl, N, Gt]
            rows = []
            for c in range(2):
                for j in range(l):
                    d = digs[c][j]
                    rows.append(jnp.where(d < 0, d + pi32, d).astype(U32))
            dr = jnp.stack(rows, axis=0)
            dhat = _fwd_body(dr, tw_ref, twsh_ref, msk_ref, shifts_fwd, q, p, n)
            # external product: eh[cout] = sum_j brk[q, j, cout] * dhat[j]
            outs = []
            for cout in range(2):
                accu = None
                for j in range(cpl):
                    w = brk_ref[q, j, cout][:, None]  # [N, 1]
                    w_s = brks_ref[q, j, cout][:, None]
                    prod = _shoup(w, w_s, dhat[j], p)
                    if accu is None:
                        accu = prod
                    else:
                        s = accu + prod
                        accu = jnp.where(s >= p, s - p, s)
                outs.append(accu)
            eh = jnp.stack(outs, axis=0)  # [2, N, Gt]
            # monomial weight
            mono = mono_ref[q][None]  # [1, N, Gt]
            mono_s = monos_ref[q][None]
            w = _shoup(mono, mono_s, eh, p)
            rs.append(
                _inv_body(
                    w, itw_ref, itwsh_ref, imsk_ref, shifts_inv, q, p, n,
                    U32(ninvs[q]), U32(ninv_shs[q]),
                )
            )
        delta = _garner_u32(rs, primes)  # [2, N, Gt]
        out_ref[:] = acc + delta

    tabs = [
        jnp.asarray(fwd_tw),
        jnp.asarray(fwd_sh),
        jnp.asarray(fwd_msk),
        jnp.asarray(inv_tw),
        jnp.asarray(inv_sh),
        jnp.asarray(inv_msk),
    ]

    def step(acc, brk, brk_sh, mono, mono_sh):
        g = acc.shape[-1]
        return x32_trace(pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct(acc.shape, acc.dtype),
            grid=(g // g_tile,),
            in_specs=[
                pl.BlockSpec((npr, s_count, n), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, s_count, n), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((s_count, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, s_count, n), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, s_count, n), lambda b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((s_count, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((2, n, g_tile), lambda b: (0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, cpl, 2, n), lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, cpl, 2, n), lambda b: (0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, n, g_tile), lambda b: (0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, n, g_tile), lambda b: (0, 0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (2, n, g_tile), lambda b: (0, 0, b), memory_space=pltpu.VMEM
            ),
            # the fully unrolled stage pipeline wants ~40M of stack at
            # N=1024/Gt=64; v5e has 128M VMEM, so raise the scoped limit
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
            interpret=interpret,
        ))(*tabs, acc, brk, brk_sh, mono, mono_sh)

    return step


@functools.partial(jax.jit, static_argnames=("params", "g_tile", "interpret"))
def bootstrap_fused(ct: Lwe, scheme, params, g_tile: int = 64, interpret: bool = False) -> Lwe:
    """CGGI bootstrap with the fully fused step kernel.

    scheme: kernels.batchminor.BmScheme (same key layout).  Bit-identical
    to the other engines.
    """
    from ..schemes.common import initial_acc, keyswitch_table, mod_switch_2n

    ctx = make_ring_ctx(params.big_n, params.torus_bits, params.nprimes)
    tildeb, tildea = mod_switch_2n(ct, params.big_n)
    g = tildea.shape[0]
    # Mosaic lane constraint: the G block must be a multiple of 128 or the
    # whole axis.  g <= g_tile keeps one block; otherwise round to 128s,
    # falling back to the whole axis for batches not divisible by 128.
    gt = g if g <= g_tile else max(128, (g_tile // 128) * 128)
    if g % gt != 0:
        gt = g
    acc = jnp.transpose(initial_acc(tildeb, params.big_n, params.k, ctx.dtype), (1, 2, 0))
    step_fn = make_cggi_step_kernel(params, ctx, gt, interpret)

    def step(acc, xs):
        brk_h, brk_s, ta = xs
        mono = jnp.transpose(scheme.mono_hat[ta], (1, 2, 0))
        mono_s = jnp.transpose(scheme.mono_shoup[ta], (1, 2, 0))
        return step_fn(acc, brk_h, brk_s, mono, mono_s), None

    acc, _ = jax.lax.scan(step, acc, (scheme.brk_bm, scheme.brk_bm_shoup, tildea.T))
    acc = jnp.transpose(acc, (2, 0, 1))
    return keyswitch_table(acc, scheme.ksk_b, scheme.ksk_a, params.f, params.log_d)
