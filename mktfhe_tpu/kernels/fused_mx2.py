"""Whole-rotation mx phase-1 kernel: one Pallas call per party sweep.

Round 2's mx engine (fused_mx.py) launched one `pallas_call` per CMux
step, round-tripping the phase-1 accumulator (12.6 MB at KMS8/batch-128)
through HBM 560 times per party and gathering a 6.3 MB monomial slab per
step on the XLA side -- measured at 27% of its own VPU roofline
(VERDICT.md round 2, weak #3).  This engine keeps the identical per-step
math (bit-identical outputs, see tests/test_fused_mx2.py) but restructures
the sweep:

  * ONE `pallas_call` per party: the grid is (batch-tile, step); the
    accumulator lives in VMEM scratch for the whole n-step sweep (fetched
    at step 0, written back through the aliased output at the last step).
    Per-step HBM traffic drops from ~32 MB to ~2.5 MB (brk row + monomial
    factor rows), and the 560 XLA-side gather/transpose/launch rounds per
    party disappear.
  * The monomial (X^a - 1) is factorized instead of gathered: in the mx
    evaluation order, position (b', k1) evaluates at psi^o with
    o = 2*k1 + 256*bitrev(b') + 1, so

        psi^(a*o) = A[a, k1] * B[a, b'],
        A[a, k1] = psi^(2*a*k1),  B[a, b'] = psi^(a*(256*bitrev(b')+1)),

    and (X^a - 1)*e = A*B*e - e needs two Shoup multiplies plus one lazy
    subtract per element.  A/B rows for all steps are row-gathered once
    per party (110 MB + 14 MB streamed over the sweep, vs 3.5 GB for the
    full per-step monomial slabs).
  * The forward twiddle T[b', k1] is folded into the per-b' MXU matrix
    (diag(T[b',:]) @ M mod p, still 4 exact bf16 limbs), deleting the
    forward twiddle pass.
  * The inverse GS stages run in place on a VMEM scratch ref instead of
    rebuilding the array with concatenates.

Counterpart of the reference's per-party `phase_1`
(/root/reference/src/tfhe/bootstrapping.jl:389-443); the factorized NTT
itself is documented in mx_ntt.py.
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
from ..ring.modring import shoup, _root_of_unity
from .fused_kms import _decomp_pairs, _pair_add, garner_pairs
from .mx_ntt import NK, MxPlan, from_mx_order, mx_plan
from .ntt_pallas import _shoup_lazy, x32_trace

U32 = jnp.uint32


# ── shared mx-kernel helpers (moved here from the retired round-2 mx
# engine, fused_mx.py, when it was folded into history in round 5) ──


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


def _bitrev_int(v: int, bits: int) -> int:
    return int(f"{v:0{bits}b}"[::-1], 2) if bits else 0


@functools.lru_cache(maxsize=None)
def mono_factor_tables(n: int, nprimes: int):
    """Row tables for the A*B monomial factorization (host numpy).

    Returns (a_tab, a_sh, b_tab, b_sh):
      a_tab [npr, 2N, NK]  A[a, k1] = psi^(2*a*k1) mod p
      b_tab [npr, 2N, nb]  B[a, b'] = psi^(a*(256*bitrev(b')+1)) mod p
    Verified against mx_mono_table: A*B - 1 == mono_mx (tests).
    """
    plan = mx_plan(n, nprimes)
    nb = plan.nb
    bits = nb.bit_length() - 1
    o2 = np.array([256 * _bitrev_int(b, bits) + 1 for b in range(nb)])
    a = np.arange(2 * n)
    k1 = np.arange(NK)
    aidx = (2 * a[:, None] * k1[None, :]) % (4 * n)  # [2N, NK]
    bidx = (a[:, None] * o2[None, :]) % (4 * n)  # [2N, nb]
    a_tabs, a_shs, b_tabs, b_shs = [], [], [], []
    for p in [int(x) for x in plan.primes]:
        psi = _root_of_unity(p, 2 * n)
        pw = np.zeros(4 * n, dtype=np.uint64)
        cur = 1
        for e in range(4 * n):
            pw[e] = cur
            cur = (cur * psi) % p
        at = pw[aidx].astype(np.uint32)
        bt = pw[bidx].astype(np.uint32)
        a_tabs.append(at)
        a_shs.append(((at.astype(object) << 32) // p).astype(np.uint64).astype(np.uint32))
        b_tabs.append(bt)
        b_shs.append(((bt.astype(object) << 32) // p).astype(np.uint64).astype(np.uint32))
    return (
        np.stack(a_tabs), np.stack(a_shs), np.stack(b_tabs), np.stack(b_shs),
    )


def mx_mono_table(ctx: RingCtx):
    """Monomial table (X^a - 1) transformed to the mx domain -- the
    validation ORACLE for mono_factor_tables (tests assert A*B - 1 ==
    mono_mx); engines use the factor tables, not this.  (Moved here from
    the retired round-2 mx engine.)

    Computed directly from the evaluation exponents: mx position
    pos = k2'*128 + k1 evaluates at psi^(2(k1 + 128*bitrev(k2')) + 1).
    """
    from ..ring.modring import _root_of_unity as _rou

    plan = mx_plan(ctx.n, ctx.nprimes)
    n, nb = ctx.n, plan.nb
    bits = nb.bit_length() - 1
    k2p = np.arange(nb)
    k2 = np.array([_bitrev_int(int(v), bits) for v in k2p])
    o = (2 * (np.arange(NK)[None, :] + NK * k2[:, None]) + 1).reshape(-1)  # [N]
    a = np.arange(2 * n)
    expo = (a[:, None] * o[None, :]) % (4 * n)  # [2N, N]
    tabs, shs = [], []
    for q, p in enumerate([int(x) for x in plan.primes]):
        psi = _rou(p, 2 * n)
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


def _gather_mono_factors(tildea_p, n_ring: int, npr: int):
    """Per-step A/B factor rows for one party.

    tildea_p: [G, n_steps] int32 in [0, 2N).  Returns
      (a_fac, a_sh) [n_steps, npr, NK, G] and (b_fac, b_sh)
      [n_steps, npr, nb, G] -- row gathers (contiguous NK/nb-wide rows),
      which XLA lowers to efficient slice gathers.
    """
    a_tab, a_sh, b_tab, b_sh = mono_factor_tables(n_ring, npr)
    idx = tildea_p.T  # [n_steps, G]

    def take(tab):
        t = jnp.take(jnp.asarray(tab), idx, axis=1)  # [npr, n, G, W]
        return jnp.transpose(t, (1, 0, 3, 2))  # [n, npr, W, G]

    return take(a_tab), take(a_sh), take(b_tab), take(b_sh)


def _inv_gs_stages_ref(ref, q: int, plan: MxPlan, p: int):
    """Inverse (GS) stages of size nb, in place on ref [nb, NK, gt]
    (< 2p in, < 2p out; 1/nb folded into the untwiddle table)."""
    nb = plan.nb
    two_p = U32(2 * p)
    pp = U32(p)
    t, mlen = 1, nb
    for _s in range(plan.s_count):
        h = mlen // 2
        for blk in range(h):
            w = U32(int(plan.ibt[q, h + blk]))
            w_sh = U32(int(plan.ibt_sh[q, h + blk]))
            base = 2 * blk * t
            u = ref[base : base + t]
            v = ref[base + t : base + 2 * t]
            hi = _cond_sub(u + v, two_p)  # < 2p
            d = u + (two_p - v)  # < 4p
            lo = _shoup_lazy(w, w_sh, d, pp)  # < 2p
            ref[base : base + t] = hi
            ref[base + t : base + 2 * t] = lo
        t *= 2
        mlen = h


def make_mx_sweep_kernel(params, ctx: RingCtx, iter_rows: int, n_steps: int, g_tile: int, interpret: bool):
    """Build sweep(acc_lo, acc_hi, brk, brk_sh, a_fac, a_sh, b_fac, b_sh).

    acc_*: [iter_rows, 2, nb, NK, G] u32 (mx coefficient order); brk:
    [n_steps, npr, 2l, 2, nb, NK] mx-domain (+ shoup); a_fac:
    [n_steps, npr, NK, G] (+ shoup); b_fac: [n_steps, npr, nb, G]
    (+ shoup).  Returns the final accumulator pair after all n_steps CMux
    steps: acc <- acc + INTT((A*B - 1) * (brk_s @ NTT(decomp(acc)))).
    """
    n = ctx.n
    npr = ctx.nprimes
    plan = mx_plan(n, npr)
    nb = plan.nb
    l, log_b = params.l_gsw, params.log_b_gsw
    cpl = 2 * l
    nsplit = _digit_split(log_b)
    primes = [int(p) for p in plan.primes]

    # forward matrices with the twiddle T[b',k1] folded in:
    # fmat2[q, b', split, limb] = bf16 limbs of (diag(T[b',:]) @ M * 512^split)
    fmats = []
    for q, p in enumerate(primes):
        m = plan.fwd_mat[q].astype(object)  # [k1, a']
        per_b = []
        for b in range(nb):
            tb = plan.tw[q, b].astype(object)  # [k1]
            mb = (tb[:, None] * m) % p
            per_split = []
            for sp in range(nsplit):
                ms = (mb * pow(2, 9 * sp, p)) % p
                rem = ms.copy()
                limbs = []
                for _ in range(4):
                    d = ((rem + 128) % 256) - 128
                    limbs.append(d.astype(np.float32))
                    rem = (rem - d) // 256
                assert np.all(rem == 0)
                per_split.append(np.stack(limbs))
            per_b.append(np.stack(per_split))
        fmats.append(np.stack(per_b))
    fmat2 = jnp.asarray(np.stack(fmats), jnp.bfloat16)  # [npr,nb,nsplit,4,NK,NK]
    imat_bf = jnp.asarray(plan.inv_mat_bf, jnp.bfloat16)  # [npr,4,4,NK,NK]
    # untwiddle with 1/nb folded (as fused_mx)
    itwn = np.zeros_like(plan.itw)
    itwn_sh = np.zeros_like(plan.itw_sh)
    for q, p in enumerate(primes):
        ninv = int(plan.ninv_nb[q])
        t = (plan.itw[q].astype(object) * ninv) % p
        itwn[q] = t.astype(np.uint32)
        itwn_sh[q] = np.vectorize(lambda w: shoup(int(w), p))(t).astype(np.uint32)
    itwn = jnp.asarray(itwn)
    itwn_sh = jnp.asarray(itwn_sh)

    def kernel(fmat_ref, imat_ref, itw_ref, itwsh_ref,
               acc_lo_ref, acc_hi_ref, brk_ref, brks_ref,
               a_ref, as_ref, b_ref, bs_ref,
               out_lo_ref, out_hi_ref,
               dig_ref, what_ref, e_ref, tmp_ref, wrk_lo_ref, wrk_hi_ref):
        s = pl.program_id(1)

        @pl.when(s == 0)
        def _init():
            wrk_lo_ref[...] = acc_lo_ref[...]
            wrk_hi_ref[...] = acc_hi_ref[...]

        for r in range(iter_rows):
            acc_lo = wrk_lo_ref[r]  # [2, nb, NK, gt]
            acc_hi = wrk_hi_ref[r]

            # gadget decomposition, once per row, shared by all primes
            for c in range(2):
                digs = _decomp_pairs(acc_lo[c], acc_hi[c], l, log_b)
                for lev in range(l):
                    d = digs[lev]  # i32 [nb, NK, gt], |d| <= 2^(log_b-1)
                    j = c * l + lev
                    if nsplit == 1:
                        dig_ref[j, 0] = d.astype(jnp.bfloat16)
                    else:
                        d1 = (d + 256) >> 9
                        d0 = d - (d1 << 9)
                        dig_ref[j, 0] = d0.astype(jnp.bfloat16)
                        dig_ref[j, 1] = d1.astype(jnp.bfloat16)

            for q in range(npr):  # static prime loop
                p = primes[q]
                pp = U32(p)
                two_p = U32(2 * p)
                r16 = (1 << 16) % p
                r16_sh = shoup(r16, p)
                c2p = int(np.array(2 * p, np.uint32).view(np.int32))

                # ── forward: twiddled matmul per b', then CT stages ──
                for j_ in range(cpl):
                    def fwd_b(b, _, j_=j_):
                        ss = []
                        for i in range(4):
                            acc = None
                            for sp in range(nsplit):
                                d = jax.lax.dot_general(
                                    fmat_ref[q, b, sp, i], dig_ref[j_, sp, b],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                )
                                acc = d if acc is None else acc + d
                            ss.append(acc.astype(jnp.int32))
                        t01 = ss[0] + (ss[1] << 8)
                        t23 = ss[2] + (ss[3] << 8)
                        up = jax.lax.bitcast_convert_type(t23 + c2p, U32)
                        m = _shoup_lazy(U32(r16), U32(r16_sh), up, pp)  # < 2p
                        tp = jax.lax.bitcast_convert_type(t01 + c2p, U32)
                        tp = _cond_sub(tp, two_p)  # < 2p
                        what_ref[j_, b] = tp + m  # < 4p (stages tolerate)
                        return 0

                    jax.lax.fori_loop(0, nb, fwd_b, 0)
                    _fwd_ct_stages(what_ref, j_, q, plan, p)

                # ── external product + A*B-1 monomial + inverse ──
                for cout in range(2):
                    eh = None
                    for j_ in range(cpl):
                        w = brk_ref[0, q, j_, cout][:, :, None]
                        w_sh = brks_ref[0, q, j_, cout][:, :, None]
                        prod = _shoup_lazy(w, w_sh, what_ref[j_], pp)  # < 2p
                        eh = prod if eh is None else _cond_sub(eh + prod, two_p)
                    # m_eh = (A*B - 1) * eh = B*(A*eh) + (2p - eh), all lazy
                    av = a_ref[0, q][None]  # [1, NK, gt]
                    avs = as_ref[0, q][None]
                    bv = b_ref[0, q][:, None]  # [nb, 1, gt]
                    bvs = bs_ref[0, q][:, None]
                    t1 = _shoup_lazy(av, avs, eh, pp)  # < 2p
                    t2 = _shoup_lazy(bv, bvs, t1, pp)  # < 2p
                    m_eh = _cond_sub(t2 + (two_p - eh), two_p)  # < 2p
                    tmp_ref[...] = m_eh
                    _inv_gs_stages_ref(tmp_ref, q, plan, p)

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
                            acc = None
                            for jl in range(4):
                                d = jax.lax.dot_general(
                                    imat_ref[q, jl, i], limbs[jl],
                                    (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32,
                                )
                                acc = d if acc is None else acc + d
                            ss.append(acc.astype(jnp.int32))
                        t01 = ss[0] + (ss[1] << 8)
                        t23 = ss[2] + (ss[3] << 8)
                        up = jax.lax.bitcast_convert_type(t23 + c2p, U32)
                        m = _shoup_lazy(U32(r16), U32(r16_sh), up, pp)
                        tp = jax.lax.bitcast_convert_type(t01 + c2p, U32)
                        tp = _cond_sub(tp, two_p)
                        rr = _cond_sub(tp + m, two_p)
                        rr = _cond_sub(rr, two_p)
                        e_ref[q, cout, b] = _cond_sub(rr, pp)  # canonical
                        return 0

                    jax.lax.fori_loop(0, nb, inv_b, 0)

            # ── Garner + u64 accumulate (u32 pairs) into the work acc ──
            rs = [e_ref[q] for q in range(npr)]
            dlo, dhi = garner_pairs(rs, ctx)
            lo2, hi2 = _pair_add(acc_lo, acc_hi, dlo, dhi)
            wrk_lo_ref[r] = lo2
            wrk_hi_ref[r] = hi2

        @pl.when(s == n_steps - 1)
        def _flush():
            out_lo_ref[...] = wrk_lo_ref[...]
            out_hi_ref[...] = wrk_hi_ref[...]

    def sweep(acc_lo, acc_hi, brk, brk_sh, a_fac, a_sh, b_fac, b_sh):
        g = acc_lo.shape[-1]
        gt = min(g, g_tile)
        assert g % gt == 0
        acc_shape = (iter_rows, 2, nb, NK, gt)
        n_tabs = 4
        return x32_trace(pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(acc_lo.shape, U32),
                jax.ShapeDtypeStruct(acc_hi.shape, U32),
            ),
            grid=(g // gt, n_steps),
            in_specs=[
                pl.BlockSpec(fmat2.shape, lambda b, s: (0,) * 6, memory_space=pltpu.VMEM),
                pl.BlockSpec(imat_bf.shape, lambda b, s: (0,) * 5, memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, nb, NK), lambda b, s: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((npr, nb, NK), lambda b, s: (0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec(acc_shape, lambda b, s: (0, 0, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec(acc_shape, lambda b, s: (0, 0, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npr, cpl, 2, nb, NK), lambda b, s: (s, 0, 0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npr, cpl, 2, nb, NK), lambda b, s: (s, 0, 0, 0, 0, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npr, NK, gt), lambda b, s: (s, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npr, NK, gt), lambda b, s: (s, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npr, nb, gt), lambda b, s: (s, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec((1, npr, nb, gt), lambda b, s: (s, 0, 0, b), memory_space=pltpu.VMEM),
            ],
            out_specs=(
                pl.BlockSpec(acc_shape, lambda b, s: (0, 0, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec(acc_shape, lambda b, s: (0, 0, 0, 0, b), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((cpl, nsplit, nb, NK, gt), jnp.bfloat16),  # dig
                pltpu.VMEM((cpl, nb, NK, gt), U32),  # what
                pltpu.VMEM((npr, 2, nb, NK, gt), U32),  # e residues
                pltpu.VMEM((nb, NK, gt), U32),  # tmp (inverse staging)
                pltpu.VMEM(acc_shape, U32),  # resident acc lo
                pltpu.VMEM(acc_shape, U32),  # resident acc hi
            ],
            input_output_aliases={n_tabs: 0, n_tabs + 1: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=112 * 1024 * 1024
            ),
            interpret=interpret,
        ))(fmat2, imat_bf, itwn, itwn_sh,
           acc_lo, acc_hi, brk, brk_sh, a_fac, a_sh, b_fac, b_sh)

    return sweep


# ─── key material & driver ────────────────────────────────────────────────


@jax.tree_util.register_dataclass
@dataclasses.dataclass(frozen=True)
class MxKmsKeys:
    """KMS phase-1 keys in the mx evaluation domain (no monomial table --
    the v2 engine computes monomials in-kernel from factor rows).

    brk_mx: [k, n, npr, 2l, 2, N] u32 (+ shoup)."""

    brk_mx: jnp.ndarray
    brk_mx_shoup: jnp.ndarray


def build_mx_kms_keys(party_keys, params, chunk: int = 80, npr: int | None = None, store_shoup: bool = True, consume_brk: bool = False) -> MxKmsKeys:
    """Convert KMS party keys (torus domain) for the mx engines.

    Pipelined over n-bit chunks across ALL parties (round 2 transformed one
    party at a time with a hard sync per party -- 60 s at k=8; chunking
    keeps peak memory at one chunk's intermediates while letting the
    device pipeline across parties and chunks).

    npr overrides the CRT prime count (mx3's block presets use a
    different reconstruction bound, fused_mx3.mx3_nprimes).

    store_shoup=False skips the Shoup companion table (brk_mx_shoup is
    None), HALVING resident key HBM -- what lets KMS16party fit one v5e.
    Only the mx3 engine can consume such keys (it derives approximate
    companions in-kernel, make_mx3_sweep_kernel).

    consume_brk=True additionally releases each party's TORUS-domain brk
    (party_keys must be a mutable list holding the only references) as
    soon as it is converted, capping the build's peak HBM at one party's
    torus keys + the growing mx material instead of both full tables --
    at KMS16 that is the difference between ~9.5 GB peak and ~14.7 GB."""
    from ..ring.context import nprimes_needed
    from ..ring.torus import lift
    from .mx_ntt import mx_fwd_ref

    half_b = 1 << (params.log_b_gsw - 1)
    if npr is None:
        npr = nprimes_needed(
            params.ring_torus_bits, params.big_n, [(half_b, params.l_gsw * 2 * 2)]
        )
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, npr)
    plan = mx_plan(ctx.n, npr)
    n = params.n

    @jax.jit
    def one_chunk(brk_c):  # [c, 2, l, 2, N] u64 (one party's bit chunk)
        hat = mx_fwd_ref(lift(brk_c, ctx.crt), plan)  # [c, 2, l, 2, npr, N]
        c, cin, l, cout = hat.shape[:4]
        hat = jnp.transpose(hat, (0, 4, 1, 2, 3, 5)).reshape(
            c, npr, cin * l, cout, ctx.n
        )
        if not store_shoup:
            return hat, None
        p = jnp.asarray(np.asarray(plan.primes, np.uint64))[:, None, None, None]
        sh = ((hat.astype(jnp.uint64) << 32) // p).astype(U32)
        return hat, sh

    # per-(party, bit-chunk) calls, dispatched WITHOUT per-party hard syncs
    # (round 2 block_until_ready'd each party): the queue pipelines while
    # per-call intermediates stay bounded by the chunk size.
    hats, shs = [], []
    for i, pk in enumerate(party_keys):
        phs, pss = [], []
        for c0 in range(0, n, chunk):
            h, s = one_chunk(pk.brk[c0 : c0 + chunk])
            phs.append(h)
            pss.append(s)
        hats.append(jnp.concatenate(phs, axis=0))
        if store_shoup:
            shs.append(jnp.concatenate(pss, axis=0))
        if consume_brk:
            jax.block_until_ready(hats[-1])
            party_keys[i] = pk._replace(brk=jnp.zeros((0,), dtype=pk.brk.dtype))
    return MxKmsKeys(
        brk_mx=jnp.stack(hats),
        brk_mx_shoup=jnp.stack(shs) if store_shoup else None,
    )


def kms_phase1_mx2(tildea_p, brk_p, brk_sh_p, iter_rows: int, params, out_ctx: RingCtx, g_tile: int = 128, interpret: bool = False):
    """v2 mx-engine KMS phase 1 for one party.

    tildea_p: [G, n]; brk_p: [n, npr, 2l, 2, N] (mx domain).  Returns the
    party's lev key in the standard prime basis: [G, iter_rows, 2, npr, N].
    Bit-identical to kms.phase1 (tests/test_fused_mx2.py).
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
    n_steps = tildea_p.shape[1]

    gvec = gadget_gvec(params.l_lev, params.log_b_lev, ctx_p.dtype)[:iter_rows]
    acc_lo = jnp.zeros((iter_rows, 2, nb, NK, g), dtype=U32)
    acc_hi = jnp.zeros((iter_rows, 2, nb, NK, g), dtype=U32)
    acc_lo = acc_lo.at[:, 0, 0, 0, :].set((gvec & jnp.uint64(0xFFFFFFFF)).astype(U32)[:, None])
    acc_hi = acc_hi.at[:, 0, 0, 0, :].set((gvec >> 32).astype(U32)[:, None])

    brk_steps = brk_p.reshape(n_steps, npr_p, -1, 2, nb, NK)
    brk_sh_steps = brk_sh_p.reshape(*brk_steps.shape)
    a_fac, a_sh, b_fac, b_sh = _gather_mono_factors(
        tildea_p.astype(jnp.int32), n, npr_p
    )

    sweep = make_mx_sweep_kernel(params, ctx_p, iter_rows, n_steps, g_tile, interpret)
    acc_lo, acc_hi = sweep(
        acc_lo, acc_hi, brk_steps, brk_sh_steps, a_fac, a_sh, b_fac, b_sh
    )
    acc = acc_lo.astype(jnp.uint64) | (acc_hi.astype(jnp.uint64) << 32)
    acc = from_mx_order(acc.reshape(iter_rows, 2, n, g).swapaxes(-1, -2), nb)
    acc_std = jnp.transpose(acc, (2, 0, 1, 3))  # [G, rows, 2, N]
    return fwd_ntt(lift(acc_std, out_ctx.crt), out_ctx.plan)


@functools.partial(jax.jit, static_argnames=("params", "interpret", "pallas_ntt", "g_tile"))
def bootstrap_mx2(ct, scheme, mx_keys: MxKmsKeys, params, interpret: bool = False, pallas_ntt: bool = True, g_tile: int = 128):
    """KMS bootstrap with the v2 (whole-rotation) mx phase-1 engine.

    Phase 2 / key switch as in schemes.kms; bit-identical to kms.bootstrap.
    """
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

    lev0 = kms_phase1_mx2(
        tild[0], mx_keys.brk_mx[0], mx_keys.brk_mx_shoup[0],
        1, params, ctx, g_tile=g_tile, interpret=interpret,
    )
    if k > 1:
        lev_rest = jax.lax.map(
            lambda xs: kms_phase1_mx2(
                xs[0], xs[1], xs[2], params.l_lev, params, ctx,
                g_tile=g_tile, interpret=interpret,
            ),
            (tild[1:], mx_keys.brk_mx[1:], mx_keys.brk_mx_shoup[1:]),
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
