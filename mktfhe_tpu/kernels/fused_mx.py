"""Fused KMS phase-1 step kernel with the MXU-factorized NTT (mx engine).

Replaces the round-1 fused kernel's all-VPU butterflies (fused_kms.py)
with the mx-NTT split (mx_ntt.py): per CMux step and party --

    gadget-decompose the u64 accumulator (u32 limb pairs)
      -> forward mx-NTT: 128-point stage as exact bf16 limb matmuls on the
         MXU, twiddle + N/128-point merged-twist NTT on the VPU
      -> external product with the party's brk row (lazy Shoup pointwise)
      -> monomial weight (X^a - 1) in the mx evaluation domain
      -> inverse mx-NTT (mirror)
      -> Garner reconstruction and the u64 accumulate, all in-kernel

-- one Pallas program per (RLEV row, batch tile), CRT primes as a static
in-program loop.  The accumulator lives in the *permuted* coefficient
order of mx_ntt.to_mx_order throughout the scan; every coefficient-domain
op in the loop is elementwise, so only the scan boundaries convert.

Counterpart of the reference's per-party `phase_1`
(/root/reference/src/tfhe/bootstrapping.jl:389-443).  Bit-identical to
kms.phase1 / kms_phase1_bm / kms_phase1_fused -- same exact integers --
see tests/test_fused_mx.py.

Exactness of the MXU path: see mx_ntt.py's module docstring (all bf16
operands are integers with |v| <= 256; all f32 accumulations < 2^24).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ring.context import RingCtx, make_ring_ctx
from ..ring.modring import shoup
from .fused_kms import _decomp_pairs, _pair_add, garner_pairs
from .mx_ntt import NK, MxPlan, from_mx_order, mx_plan, to_mx_order
from .ntt_pallas import _mulhi, x32_trace

U32 = jnp.uint32


def _shoup_lazy(w, w_sh, a, p):
    """w*a mod p in [0, 2p), valid for any a < 2^32."""
    return w * a - _mulhi(w_sh, a) * p


def _cond_sub(x, c):
    return jnp.where(x >= c, x - c, x)


def _digit_split(log_b: int) -> int:
    """Number of bf16 operands per gadget digit (|digit| <= 2^(log_b-1));
    bf16 is exact for integers |v| <= 256, so one operand up to log_b=9,
    two (base-512 split) up to log_b=18."""
    return 1 if log_b <= 9 else 2


def _fwd_ct_stages(ref, j: int, q: int, plan: MxPlan, p: int):
    """Merged-twist CT stages of size nb along the leading axis of
    ref[j] (shape [nb, NK, gt]), in place.  Harvey-lazy: values stay
    < 4p in flight, output canonicalized to < 2p."""
    nb = plan.nb
    two_p = U32(2 * p)
    pp = U32(p)
    mlen, t = 1, nb
    for _s in range(plan.s_count):
        t //= 2
        for blk in range(mlen):
            w = U32(int(plan.bt[q, mlen + blk]))
            w_sh = U32(int(plan.bt_sh[q, mlen + blk]))
            base = 2 * blk * t
            u = ref[j, base : base + t]
            v = ref[j, base + t : base + 2 * t]
            u = _cond_sub(u, two_p)  # < 2p
            vw = _shoup_lazy(w, w_sh, v, pp)  # < 2p
            ref[j, base : base + t] = u + vw  # < 4p
            ref[j, base + t : base + 2 * t] = u + (two_p - vw)  # < 4p
        mlen *= 2
    x = ref[j]
    x = _cond_sub(_cond_sub(x, two_p), two_p)
    ref[j] = _cond_sub(x, two_p)  # < 2p


def _inv_gs_stages(x, q: int, plan: MxPlan, p: int):
    """Inverse (GS) stages of size nb on a value x [nb, NK, gt] (< 2p in,
    < 2p out; 1/nb is folded into the untwiddle table)."""
    nb = plan.nb
    two_p = U32(2 * p)
    pp = U32(p)
    t, mlen = 1, nb
    for _s in range(plan.s_count):
        h = mlen // 2
        parts = []
        for blk in range(h):
            w = U32(int(plan.ibt[q, h + blk]))
            w_sh = U32(int(plan.ibt_sh[q, h + blk]))
            base = 2 * blk * t
            u = x[base : base + t]
            v = x[base + t : base + 2 * t]
            hi = _cond_sub(u + v, two_p)  # < 2p
            d = u + (two_p - v)  # < 4p
            lo = _shoup_lazy(w, w_sh, d, pp)  # < 2p
            parts.append(hi)
            parts.append(lo)
        x = jnp.concatenate(parts, axis=0)
        t *= 2
        mlen = h
    return x


def make_mx_step_kernel(params, ctx: RingCtx, iter_rows: int, g_tile: int, interpret: bool):
    """Build step(acc_lo, acc_hi, brk, brk_sh, mono, mono_sh) -> (lo, hi).

    acc_*: [iter_rows, 2, nb, NK, G] u32 (mx coefficient order); brk:
    [npr, 2l, 2, nb, NK] mx-domain (+ shoup); mono: [npr, nb, NK, G]
    (+ shoup).  Returns the UPDATED accumulator pair (acc + INTT(mono *
    (brk @ NTT(decomp(acc))))), aliased onto the acc inputs.
    """
    n = ctx.n
    npr = ctx.nprimes
    plan = mx_plan(n, npr)
    nb = plan.nb
    l, log_b = params.l_gsw, params.log_b_gsw
    cpl = 2 * l
    nsplit = _digit_split(log_b)
    primes = [int(p) for p in plan.primes]

    # bf16 matrices: fwd [npr, nsplit, LM, NK, NK] (split s scales M by
    # 512^s); inv [npr, LD, LM, NK, NK] (data-limb j folds 2^(8j))
    fmats = []
    for q, p in enumerate(primes):
        per_split = [plan.fwd_mat_bf[q]]
        if nsplit == 2:
            m512 = (plan.fwd_mat[q].astype(object) * pow(2, 9, p)) % p
            rem = m512.copy()
            limbs = []
            for _ in range(4):
                d = ((rem + 128) % 256) - 128
                limbs.append(d.astype(np.float32))
                rem = (rem - d) // 256
            per_split.append(np.stack(limbs))
        fmats.append(np.stack(per_split))
    fmat_bf = jnp.asarray(np.stack(fmats), jnp.bfloat16)  # [npr,nsplit,4,NK,NK]
    imat_bf = jnp.asarray(plan.inv_mat_bf, jnp.bfloat16)  # [npr,4,4,NK,NK]
    tw = jnp.asarray(plan.tw.transpose(0, 1, 2))  # [npr, nb, NK]
    tw_sh = jnp.asarray(plan.tw_sh)
    # fold 1/nb into the untwiddle
    itwn = np.zeros_like(plan.itw)
    itwn_sh = np.zeros_like(plan.itw_sh)
    for q, p in enumerate(primes):
        ninv = int(plan.ninv_nb[q])
        t = (plan.itw[q].astype(object) * ninv) % p
        itwn[q] = t.astype(np.uint32)
        itwn_sh[q] = np.vectorize(lambda w: shoup(int(w), p))(t).astype(np.uint32)
    itwn = jnp.asarray(itwn)
    itwn_sh = jnp.asarray(itwn_sh)

    def kernel(fmat_ref, imat_ref, tw_ref, twsh_ref, itw_ref, itwsh_ref,
               acc_lo_ref, acc_hi_ref, brk_ref, brks_ref, mono_ref, monos_ref,
               out_lo_ref, out_hi_ref,
               dig_ref, what_ref, e_ref, tmp_ref):
        gt = acc_lo_ref.shape[-1]
        # read acc once (aliased outputs share the buffer)
        acc_lo = acc_lo_ref[0]  # [2, nb, NK, gt]
        acc_hi = acc_hi_ref[0]

        # gadget decomposition, once, shared by all primes
        for c in range(2):
            digs = _decomp_pairs(acc_lo[c], acc_hi[c], l, log_b)
            for lev in range(l):
                d = digs[lev]  # i32 [nb, NK, gt], |d| <= 2^(log_b-1)
                j = c * l + lev
                if nsplit == 1:
                    dig_ref[j, 0] = d.astype(jnp.bfloat16)
                else:
                    d1 = (d + 256) >> 9  # round-ish split d = d0 + 512*d1
                    d0 = d - (d1 << 9)
                    dig_ref[j, 0] = d0.astype(jnp.bfloat16)
                    dig_ref[j, 1] = d1.astype(jnp.bfloat16)

        for q in range(npr):  # static prime loop
            p = primes[q]
            pp = U32(p)
            two_p = U32(2 * p)
            r16 = (1 << 16) % p
            r16_sh = shoup(r16, p)
            # 2p as a wrapped i32: i32 adds are two's-complement, so
            # t + c2p then bitcast-to-u32 equals (t + 2p) mod 2^32, which
            # is the true nonnegative value since 0 <= t + 2p < 2^32.
            c2p = int(np.array(2 * p, np.uint32).view(np.int32))

            # ── forward: matmul + combine + twiddle per b', CT stages ──
            for j_ in range(cpl):
                # NOTE: fwd_b must be a FRESH function object per j_ --
                # lax.fori_loop caches the traced body by function
                # identity, so a single closure defined outside this loop
                # would replay the j_-of-first-trace for every j_.
                def fwd_b(b, _, j_=j_):
                    ss = []
                    for i in range(4):
                        s = None
                        for sp in range(nsplit):
                            d = jax.lax.dot_general(
                                fmat_ref[q, sp, i], dig_ref[j_, sp, b],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            s = d if s is None else s + d
                        ss.append(s.astype(jnp.int32))
                    t01 = ss[0] + (ss[1] << 8)
                    t23 = ss[2] + (ss[3] << 8)
                    up = jax.lax.bitcast_convert_type(t23 + c2p, U32)
                    m = _shoup_lazy(U32(r16), U32(r16_sh), up, pp)  # < 2p
                    tp = jax.lax.bitcast_convert_type(t01 + c2p, U32)
                    tp = _cond_sub(tp, two_p)  # < 2p
                    r = tp + m  # < 4p, fine for the lazy twiddle
                    twv = tw_ref[q, b][:, None]
                    twsh = twsh_ref[q, b][:, None]
                    what_ref[j_, b] = _shoup_lazy(twv, twsh, r, pp)  # < 2p
                    return 0

                jax.lax.fori_loop(0, nb, fwd_b, 0)
                _fwd_ct_stages(what_ref, j_, q, plan, p)

            # ── external product + monomial + inverse per output comp ──
            for cout in range(2):
                eh = None
                for j_ in range(cpl):
                    w = brk_ref[q, j_, cout][:, :, None]
                    w_sh = brks_ref[q, j_, cout][:, :, None]
                    prod = _shoup_lazy(w, w_sh, what_ref[j_], pp)  # < 2p
                    eh = prod if eh is None else _cond_sub(eh + prod, two_p)
                eh = _shoup_lazy(mono_ref[q], monos_ref[q], eh, pp)  # < 2p
                eh = _inv_gs_stages(eh, q, plan, p)  # < 2p
                tmp_ref[:] = eh

                def inv_b(b, _):
                    v = tmp_ref[b]  # [NK, gt] < 2p
                    itv = itw_ref[q, b][:, None]
                    itsh = itwsh_ref[q, b][:, None]
                    v = _shoup_lazy(itv, itsh, v, pp)  # < 2p
                    v = _cond_sub(v, pp)  # canonical
                    vi = jax.lax.bitcast_convert_type(v, jnp.int32)
                    limbs = []
                    for _i in range(4):
                        d0 = ((vi + 128) & 255) - 128
                        limbs.append(d0.astype(jnp.bfloat16))
                        vi = (vi - d0) >> 8
                    ss = []
                    for i in range(4):
                        s = None
                        for jlimb in range(4):
                            d = jax.lax.dot_general(
                                imat_ref[q, jlimb, i], limbs[jlimb],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            s = d if s is None else s + d
                        ss.append(s.astype(jnp.int32))
                    t01 = ss[0] + (ss[1] << 8)
                    t23 = ss[2] + (ss[3] << 8)
                    up = jax.lax.bitcast_convert_type(t23 + c2p, U32)
                    m = _shoup_lazy(U32(r16), U32(r16_sh), up, pp)
                    tp = jax.lax.bitcast_convert_type(t01 + c2p, U32)
                    tp = _cond_sub(tp, two_p)
                    r = _cond_sub(tp + m, two_p)
                    r = _cond_sub(r, two_p)
                    e_ref[q, cout, b] = _cond_sub(r, pp)  # canonical
                    return 0

                jax.lax.fori_loop(0, nb, inv_b, 0)

        # ── Garner + u64 accumulate (u32 pairs), write aliased outputs ──
        rs = [e_ref[q] for q in range(npr)]
        dlo, dhi = garner_pairs(rs, ctx)
        lo2, hi2 = _pair_add(acc_lo, acc_hi, dlo, dhi)
        out_lo_ref[0] = lo2
        out_hi_ref[0] = hi2

    def step(acc_lo, acc_hi, brk, brk_sh, mono, mono_sh):
        g = acc_lo.shape[-1]
        gt = min(g, g_tile)
        assert g % gt == 0
        n_in_tabs = 6
        return x32_trace(pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(acc_lo.shape, U32),
                jax.ShapeDtypeStruct(acc_hi.shape, U32),
            ),
            grid=(iter_rows, g // gt),
            in_specs=[
                pl.BlockSpec(fmat_bf.shape, lambda r, b: (0,) * 5, memory_space=pltpu.VMEM),
                pl.BlockSpec(imat_bf.shape, lambda r, b: (0,) * 5, memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, nb, NK), lambda r, b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, nb, NK), lambda r, b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, nb, NK), lambda r, b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, nb, NK), lambda r, b: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, nb, NK, gt), lambda r, b: (r, 0, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, nb, NK, gt), lambda r, b: (r, 0, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, cpl, 2, nb, NK), lambda r, b: (0,) * 5, memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, cpl, 2, nb, NK), lambda r, b: (0,) * 5, memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, nb, NK, gt), lambda r, b: (0, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, nb, NK, gt), lambda r, b: (0, 0, 0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec((1, 2, nb, NK, gt), lambda r, b: (r, 0, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, 2, nb, NK, gt), lambda r, b: (r, 0, 0, 0, b), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((cpl, nsplit, nb, NK, gt), jnp.bfloat16),  # dig
                pltpu.VMEM((cpl, nb, NK, gt), U32),  # what
                pltpu.VMEM((npr, 2, nb, NK, gt), U32),  # e residues
                pltpu.VMEM((nb, NK, gt), U32),  # tmp
            ],
            input_output_aliases={n_in_tabs: 0, n_in_tabs + 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024
            ),
            interpret=interpret,
        ))(fmat_bf, imat_bf, tw, tw_sh, itwn, itwn_sh,
           acc_lo, acc_hi, brk, brk_sh, mono, mono_sh)

    return step


# ─── key material & driver ────────────────────────────────────────────────


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MxKmsPhase1:
    """KMS phase-1 keys in the mx evaluation domain.

    brk_mx: [k, n, npr, 2l, 2, N] u32 (+ shoup); mono table in the mx
    domain: [2N, npr, N] (+ shoup).
    """

    brk_mx: jnp.ndarray
    brk_mx_shoup: jnp.ndarray
    mono_mx: jnp.ndarray
    mono_mx_shoup: jnp.ndarray


def mx_mono_table(ctx: RingCtx):
    """Monomial table (X^a - 1) transformed to the mx domain.

    Computed directly from the evaluation exponents: mx position
    pos = k2'*128 + k1 evaluates at psi^(2(k1 + 128*bitrev(k2')) + 1).
    """
    plan = mx_plan(ctx.n, ctx.nprimes)
    n, nb = ctx.n, plan.nb
    bits = nb.bit_length() - 1
    k2p = np.arange(nb)
    k2 = np.array([int(f"{v:0{bits}b}"[::-1], 2) if bits else 0 for v in k2p])
    o = (2 * (np.arange(NK)[None, :] + NK * k2[:, None]) + 1).reshape(-1)  # [N]
    a = np.arange(2 * n)
    expo = (a[:, None] * o[None, :]) % (4 * n)  # [2N, N]
    tabs, shs = [], []
    for q, p in enumerate([int(x) for x in plan.primes]):
        from ..ring.modring import _root_of_unity

        psi = _root_of_unity(p, 2 * n)
        pw = np.zeros(4 * n, dtype=np.uint64)
        cur = 1
        for e in range(4 * n):
            pw[e] = cur
            cur = (cur * psi) % p
        t = (pw[expo] + (p - 1)) % p  # psi^(a*o) - 1 mod p
        tabs.append(t.astype(np.uint32))
        shs.append(((t.astype(object) << 32) // p).astype(np.uint64).astype(np.uint32))
    mono = jnp.asarray(np.stack(tabs, axis=1))  # [2N, npr, N]
    mono_sh = jnp.asarray(np.stack(shs, axis=1))
    return mono, mono_sh


def build_mx_kms_phase1(party_keys, params) -> MxKmsPhase1:
    """Convert KMS party keys (torus domain) for the mx phase-1 engine."""
    from ..ring.context import nprimes_needed
    from ..ring.torus import lift
    from .mx_ntt import mx_fwd_ref

    half_b = 1 << (params.log_b_gsw - 1)
    npr = nprimes_needed(
        params.ring_torus_bits, params.big_n, [(half_b, params.l_gsw * 2 * 2)]
    )
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, npr)
    plan = mx_plan(ctx.n, npr)

    @jax.jit
    def one_party(brk_p):  # [n, 2, l, 2, N] u64
        hat = mx_fwd_ref(lift(brk_p, ctx.crt), plan)  # [n, 2, l, 2, npr, N]
        nbits, cin, l, cout = hat.shape[:4]
        hat = jnp.transpose(hat, (0, 4, 1, 2, 3, 5)).reshape(
            nbits, npr, cin * l, cout, ctx.n
        )
        p = jnp.asarray(np.asarray(plan.primes, np.uint64))[:, None, None, None]
        sh = ((hat.astype(jnp.uint64) << 32) // p).astype(U32)
        return hat, sh

    hats, shs = [], []
    for pk in party_keys:
        h, s = one_party(pk.brk)
        jax.block_until_ready(h)
        hats.append(h)
        shs.append(s)
    mono, mono_sh = mx_mono_table(ctx)
    return MxKmsPhase1(
        brk_mx=jnp.stack(hats),
        brk_mx_shoup=jnp.stack(shs),
        mono_mx=mono,
        mono_mx_shoup=mono_sh,
    )


def kms_phase1_mx(tildea_p, brk_p, brk_sh_p, phase1_keys: MxKmsPhase1, iter_rows: int, params, out_ctx: RingCtx, g_tile: int = 128, interpret: bool = False):
    """mx-engine KMS phase 1 for one party (cf. fused_kms.kms_phase1_fused).

    tildea_p: [G, n]; brk_p: [n, npr, 2l, 2, N] (mx domain).  Returns the
    party's lev key in the standard prime basis: [G, iter_rows, 2, npr, N].
    """
    from ..ciphertext.rlwe import gadget_gvec
    from ..ring.ntt import fwd_ntt
    from ..ring.torus import lift

    npr_p = brk_p.shape[1]
    ctx_p = make_ring_ctx(params.big_n, params.ring_torus_bits, npr_p)
    plan = mx_plan(ctx_p.n, npr_p)
    nb = plan.nb
    g = tildea_p.shape[0]
    n = params.big_n

    gvec = gadget_gvec(params.l_lev, params.log_b_lev, ctx_p.dtype)[:iter_rows]
    acc_lo = jnp.zeros((iter_rows, 2, nb, NK, g), dtype=U32)
    acc_hi = jnp.zeros((iter_rows, 2, nb, NK, g), dtype=U32)
    # coefficient 0 sits at mx position (b'=0, a'=0) = flat 0
    acc_lo = acc_lo.at[:, 0, 0, 0, :].set((gvec & jnp.uint64(0xFFFFFFFF)).astype(U32)[:, None])
    acc_hi = acc_hi.at[:, 0, 0, 0, :].set((gvec >> 32).astype(U32)[:, None])

    step_fn = make_mx_step_kernel(params, ctx_p, iter_rows, g_tile, interpret)
    brk_steps = brk_p.reshape(brk_p.shape[0], npr_p, -1, 2, nb, NK)
    brk_sh_steps = brk_sh_p.reshape(*brk_steps.shape)

    def step(carry, xs):
        lo, hi = carry
        brk_h, brk_s, ta = xs
        mono = jnp.transpose(phase1_keys.mono_mx[ta], (1, 2, 0)).reshape(npr_p, nb, NK, g)
        mono_s = jnp.transpose(phase1_keys.mono_mx_shoup[ta], (1, 2, 0)).reshape(npr_p, nb, NK, g)
        lo2, hi2 = step_fn(lo, hi, brk_h, brk_s, mono, mono_s)
        return (lo2, hi2), None

    (acc_lo, acc_hi), _ = jax.lax.scan(
        step, (acc_lo, acc_hi), (brk_steps, brk_sh_steps, tildea_p.T)
    )
    acc = acc_lo.astype(jnp.uint64) | (acc_hi.astype(jnp.uint64) << 32)
    acc = from_mx_order(acc.reshape(iter_rows, 2, n, g).swapaxes(-1, -2), nb)
    acc_std = jnp.transpose(acc, (2, 0, 1, 3))  # [G, rows, 2, N]
    return fwd_ntt(lift(acc_std, out_ctx.crt), out_ctx.plan)


@functools.partial(jax.jit, static_argnames=("params", "interpret", "pallas_ntt", "g_tile"))
def bootstrap_mx(ct, scheme, phase1_keys: MxKmsPhase1, params, interpret: bool = False, pallas_ntt: bool = False, g_tile: int = 128):
    """KMS bootstrap with the mx phase-1 engine (phase 2 / key switch as in
    schemes.kms).  Bit-identical outputs to kms.bootstrap."""
    from ..schemes.common import initial_acc, mod_switch_2n
    from ..schemes.kms import _ctx, _keyswitch, _phase2_party
    from ..schemes.params import KmsBlockParams

    assert not isinstance(params, KmsBlockParams), (
        "the mx phase-1 kernel implements the binary-key rotation"
    )
    ctx = _ctx(params)
    k = params.k
    tildeb, tildea = mod_switch_2n(ct, params.big_n)
    g = tildea.shape[0]
    tild = jnp.moveaxis(tildea.reshape(g, k, params.n), 1, 0)  # [k, G, n]

    lev0 = kms_phase1_mx(
        tild[0], phase1_keys.brk_mx[0], phase1_keys.brk_mx_shoup[0],
        phase1_keys, 1, params, ctx, g_tile=g_tile, interpret=interpret,
    )
    if k > 1:
        lev_rest = jax.lax.map(
            lambda xs: kms_phase1_mx(
                xs[0], xs[1], xs[2], phase1_keys, params.l_lev, params, ctx,
                g_tile=g_tile, interpret=interpret,
            ),
            (tild[1:], phase1_keys.brk_mx[1:], phase1_keys.brk_mx_shoup[1:]),
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
