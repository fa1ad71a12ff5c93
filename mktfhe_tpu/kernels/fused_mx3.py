"""mx3: restructured whole-rotation phase-1 kernel (exact 3-prime CRT).

Round 3's mx2 engine (fused_mx2.py) removed the per-step launch and HBM
round-trip costs but still ran at ~1.4 ms per CMux step on a v5e -- an
xprof trace (PERF.md, round 4) shows the sweep kernel alone is 93% of the
KMS8 bootstrap, with phase 2 + key switch at ~150 ms/batch.  mx2's
remaining structural cost: the twiddle-folded per-(b', step) 128x128x128
matmuls (9216 per step at KMS8) are far too small to feed the MXU, and
the fori_loop glue serializes them against the VPU work.

This engine keeps mx2's exact arithmetic (bit-identical outputs, same
3-prime CRT and key material -- `build_mx3_kms_keys is build_mx_kms_keys`)
and restructures the compute:

  1. **Shared forward matrix + twisted-table stages.**  mx2 folded the
     twiddle T[b',k1] into per-b' matrices, forcing one matmul per b'.
     Here the 128-point stage uses ONE matrix M (per prime, per limb)
     over a whole row's 2l*gt digit columns, and the twist moves into
     per-k1 twiddle *tables* for the nb-point CT stages
     (w[e=mlen+blk, k1] = c_k1^h * Omega^(h*brv(blk)), h = nb/(2 mlen),
     c_k1 = psi^(2k1+1), Omega = psi^(2*128)): same butterfly count, no
     separate twiddle pass.  Validated in scripts/check_twisted_stages.py.
  2. **First/last stage absorbed into the matmuls.**  The first CT stage
     pairs (b, b+nb/2) with a single k1-vector twiddle w1; using two
     matrix variants (M, diag(w1) M) that stage becomes a lazy u32
     butterfly on combined matmul outputs -- one VPU stage eliminated.
     Mirror on the inverse: the last GS stage's twiddle and the 1/nb
     scale fold into two inverse-matrix variants (C' = ninv*C,
     Cw' = ninv*C*diag(w)).
  3. **Column-batched matmuls.**  Forward contraction runs over one
     row's 2l*gt digit columns at a time ([128,128]@[128,1024] per
     (prime, row, b', limb) at g_tile=128); inverse over one cout's
     rows*gt columns ([128,512]@[512,384]).  MXU-shaped matmuls instead
     of mx2's 9216 serialized 128-column ones, with the VMEM working set
     held to one (row, cout) slice.

**Negative result, recorded** (round 4): a 2-prime variant that rounded
brk to its top 41 bits (balanced-centered, so the engine stayed
bit-identical to the exact path on the truncated key) cut all kernel
work by 1/3 and measured 48.9 boots/s -- but the key-rounding error is
amplified ~2^22x by phase 2's LEV contraction + hybrid product (measured
on chip: KMS8 output noise std 2^30.25 on the u32 torus, margin 0.21
sigma, vs 2^23.9 / 17.3 sigma exact; the truncated-key ORACLE shows the
identical blowup, so the kernel itself was bit-correct).  Noise demands
truncation <= ~2^17, CRT capacity demands >= 2^23: no 2-prime operating
point exists for the KMS presets.  See PERF.md.

Counterpart of the reference's per-party `phase_1`
(/root/reference/src/tfhe/bootstrapping.jl:389-443); factorization docs
in mx_ntt.py; trace-driven attribution in PERF.md.
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
from .fused_kms import _decomp_pairs_bias, _pair_add, _pair_sub, garner_pairs
from .fused_mx2 import _cond_sub
from .ntt_pallas import _shoup_lazy3
from .fused_mx2 import (
    MxKmsKeys,
    _bitrev_int,
    _gather_mono_factors,
    build_mx_kms_keys,
    mono_factor_tables,
)
from .mx_ntt import NK, MxPlan, from_mx_order, mx_plan
from .ntt_pallas import _mulhi, x32_trace

U32 = jnp.uint32



@functools.lru_cache(maxsize=None)
def twisted_stage_tables(n: int, nprimes: int):
    """Per-k1 twisted CT/GS stage tables (host numpy).

    Returns (tf, tf_sh, ti, ti_sh), each [npr, nb, NK] u32; entry
    e = mlen+blk of the fwd DIT loop / h+blk of the inv GS loop.
    tf[e, k1] = c^h * Omega^(h*brv_lb(blk)), c = psi^(2k1+1),
    Omega = psi^(2*NK), h = nb/(2*mlen); ti = elementwise inverse.
    Entry 0 is unused.  Validated in scripts/check_twisted_stages.py.
    """
    plan = mx_plan(n, nprimes)
    nb = plan.nb
    tfs, tf_shs, tis, ti_shs = [], [], [], []
    for p in [int(x) for x in plan.primes]:
        psi = _root_of_unity(p, 2 * n)
        om = pow(psi, 2 * NK, p)
        tf = np.zeros((max(nb, 1), NK), dtype=np.uint64)
        ti = np.zeros_like(tf)
        for k1 in range(NK):
            c = pow(psi, 2 * k1 + 1, p)
            mlen = 1
            while mlen < nb:
                h = nb // (2 * mlen)
                lb = mlen.bit_length() - 1
                ch = pow(c, h, p)
                for blk in range(mlen):
                    e = mlen + blk
                    w = (ch * pow(om, h * _bitrev_int(blk, lb), p)) % p
                    tf[e, k1] = w
                    ti[e, k1] = pow(int(w), -1, p)
                mlen *= 2
        sh = lambda t: np.vectorize(lambda w: shoup(int(w), p) if w else 0)(
            t
        ).astype(np.uint32)
        tfs.append(tf.astype(np.uint32))
        tf_shs.append(sh(tf))
        tis.append(ti.astype(np.uint32))
        ti_shs.append(sh(ti))
    return np.stack(tfs), np.stack(tf_shs), np.stack(tis), np.stack(ti_shs)


def _limbs_balanced(mat, count=4):
    out = []
    rem = mat.astype(object).copy()
    for _ in range(count):
        d = ((rem + 128) % 256) - 128
        out.append(d.astype(np.float32))
        rem = (rem - d) // 256
    assert np.all(rem == 0), "limb count too small"
    return np.stack(out)


@functools.lru_cache(maxsize=None)
def _mx3_matrices(n: int, nprimes: int, nsplit: int = 1):
    """Forward/inverse matrix variants with stage-1 / last-stage absorbed.

    fmat [npr, 2, nsplit, 4, NK, NK] bf16-able f32: variant 0 = M,
    variant 1 = diag(w1) M (w1 = fwd stage-1 twiddle; identity when
    nb == 1); digit-split s scales the variant by 2^(8s) mod p (digits
    above 9 bits are fed as base-256 split planes, see the kernel).
    imat [npr, 2, 4, NK, 4*NK]: variant 0 = ninv*C with data-limb shifts
    folded ([i] = concat_j limbs_i(2^(8j) ninv C)), variant 1 likewise
    for ninv*C*diag(w_inv1).
    """
    plan = mx_plan(n, nprimes)
    nb = plan.nb
    tf, _, ti, _ = twisted_stage_tables(n, nprimes)
    fmats, imats = [], []
    for q, p in enumerate([int(x) for x in plan.primes]):
        m = plan.fwd_mat[q].astype(object)  # [k1, a']
        c = plan.inv_mat[q].astype(object)  # [a', k1]
        ninv = pow(nb, -1, p) if nb > 1 else 1
        variants_f, variants_i = [m], [(c * ninv) % p]
        if nb > 1:
            w1 = tf[q, 1].astype(object)  # [k1]
            wi1 = ti[q, 1].astype(object)
            variants_f.append((w1[:, None] * m) % p)
            variants_i.append((c * wi1[None, :] * ninv) % p)
        else:
            variants_f.append(m)
            variants_i.append((c * ninv) % p)
        fm = np.stack([
            np.stack([
                _limbs_balanced((v * pow(2, 8 * sp, p)) % p)
                for sp in range(nsplit)
            ])
            for v in variants_f
        ])  # [2, nsplit, 4, NK, NK]
        im = []
        for v in variants_i:
            per_i = []
            for i in range(4):
                segs = []
                for j in range(4):
                    vj = (v * pow(2, 8 * j, p)) % p
                    segs.append(_limbs_balanced(vj)[i])
                per_i.append(np.concatenate(segs, axis=1))  # [NK, 4NK]
            im.append(np.stack(per_i))
        imats.append((fm, np.stack(im)))
    fmat = np.stack([f for f, _ in imats])
    imat = np.stack([i for _, i in imats])
    return fmat, imat


def _combine_fwd(ss, p: int):
    """4 f32 limb matmul outputs -> u32 value < 5p (approximate-Shoup
    r16 merge; modring.PRIMES guarantee 6p < 2^32 so 5p is u32-safe)."""
    pp = U32(p)
    two_p = U32(2 * p)
    r16 = (1 << 16) % p
    r16_sh = shoup(r16, p)
    c2p = int(np.array(2 * p, np.uint32).view(np.int32))
    s = [x.astype(jnp.int32) for x in ss]
    t01 = s[0] + (s[1] << 8)
    t23 = s[2] + (s[3] << 8)
    up = jax.lax.bitcast_convert_type(t23 + c2p, U32)
    m = _shoup_lazy3(U32(r16), U32(r16_sh), up, pp)  # < 3p
    tp = jax.lax.bitcast_convert_type(t01 + c2p, U32)
    tp = _cond_sub(tp, two_p)  # < 2p
    return tp + m  # < 5p


def _combine_inv(ss, p: int):
    """4 f32 limb matmul outputs -> canonical u32 residue < p."""
    pp = U32(p)
    two_p = U32(2 * p)
    v = _combine_fwd(ss, p)  # < 5p
    v = _cond_sub(v, two_p)  # < 3p
    v = _cond_sub(v, two_p)  # < 2p
    return _cond_sub(v, pp)


def _split4_bf16(v):
    """Canonical u32 residue (< p < 2^30) -> 4 balanced base-256 bf16."""
    vi = jax.lax.bitcast_convert_type(v, jnp.int32)
    limbs = []
    for _ in range(4):
        d0 = ((vi + 128) & 255) - 128
        limbs.append(d0.astype(jnp.bfloat16))
        vi = (vi - d0) >> 8
    return limbs


def make_mx3_sweep_kernel(params, ctx: RingCtx, iter_rows: int, n_steps: int, g_tile: int, interpret: bool, ell: int = 1, has_shoup: bool = True):
    """Build sweep(acc_lo, acc_hi, brk, brk_sh, a_fac, a_sh, b_fac, b_sh).

    Same contract as fused_mx2.make_mx_sweep_kernel but with the mx3
    internals and a leading `ell` member axis on brk/a_fac/b_fac; ctx
    must be the exact mx3_nprimes ring context and brk the same mx-domain
    key material as mx2 (build_mx3_kms_keys is build_mx_kms_keys).

    ell == 1: the binary-key rotation -- per step one external product,
    monomial fused as (A*B - 1) (reconstruction bound 2 * 2l * N * B/2 *
    2^63, the reference's `phase_1`, bootstrapping.jl:389-443).

    ell > 1 (block-binary, the reference's phase-1 block variant at
    bootstrapping.jl:599-659): ONE gadget decomposition + forward NTT per
    d-block serves `ell` external products; the ell monomial-weighted
    products accumulate in the evaluation domain as TWO sums,
    U = sum_m A_m*B_m*eh_m and V = sum_m eh_m, which are inverse-
    transformed and Garner-reconstructed separately and subtracted on the
    2^64 torus (exact wrap).  The split keeps each reconstruction bound at
    ell * 2l * N * B/2 * 2^63 -- the fused (A*B-1) accumulation would
    need 2x that, pushing KMS8partyblock past the 3-prime CRT range.

    has_shoup=False drops the stored Shoup companion table (halving brk
    HBM -- what lets KMS16party fit one chip) and instead derives an
    approximate companion per step in-kernel: q0 = w*m1 + mulhi(w, m0)
    with 2^64/p = m1*2^32 + m0 underestimates floor(w*2^32/p) by at most
    1, so external products land in [0, 4p) instead of [0, 3p) -- the
    accumulation chain already tolerates that (6p < 2^32).  Costs ~0.2%
    of the step (the companion table is 1/g_tile the size of the data it
    multiplies).

    The kernel body sizes every scratch buffer and column stride with
    g_tile, so the gate batch must be a multiple of g_tile -- callers
    resolve g_tile = min(g_tile, g) first (kms_phase1_mx3 does).
    """
    import math

    n = ctx.n
    npr = ctx.nprimes
    plan = mx_plan(n, npr)
    nb = plan.nb
    half = nb // 2
    l, log_b = params.l_gsw, params.log_b_gsw
    cpl = 2 * l
    # one bf16 digit plane up to log_b = 9 (|d| <= 256 exact in bf16);
    # above that, a base-256 split d = d0 + 256*d1 with the 2^8 folded
    # into a second set of forward matrices.  |t01| <= 2p in the combine
    # caps the split at log_b <= 14 (d1 <= 64); the reference's widest
    # gadget is log_b = 12 (KMS2party, params.jl:51).
    nsplit = 1 if log_b <= 9 else 2
    assert log_b <= 14, "mx3 digit split covers log_b <= 14 (combine bound)"
    primes = [int(p) for p in plan.primes]
    # balanced-Garner exactness: |true integer| < prod(primes)/2 (DESIGN.md
    # section 2); the mono factor costs x2 only in the fused ell==1 form.
    _nt = cpl * (2 if ell == 1 else ell)
    _bound = (1 << (log_b - 1)) * (1 << 63) * n * _nt
    assert math.prod(primes) > 2 * _bound, (
        f"CRT range 2^{math.log2(math.prod(primes)):.2f} does not cover the "
        f"contraction bound 2^{math.log2(2 * _bound):.2f}; raise nprimes"
    )

    fmat_np, imat_np = _mx3_matrices(n, npr, nsplit)
    fmat = jnp.asarray(fmat_np, jnp.bfloat16)  # [npr, 2, nsplit, 4, NK, NK]
    imat = jnp.asarray(imat_np, jnp.bfloat16)  # [npr, 2, 4, NK, 4NK]
    tf, tf_sh, ti, ti_sh = (jnp.asarray(t) for t in twisted_stage_tables(n, npr))

    rows = iter_rows
    nacc = 2 if ell > 1 else 1  # eval-domain accumulators (U, V)
    fcols = rows * cpl * g_tile  # decomposition-digit columns
    half_cols = 2 * rows * g_tile  # inverse columns per accumulator
    icols = nacc * half_cols  # inverse columns (acc x couts x rows)

    def fwd_stages(ref, tf_ref, tfsh_ref, q: int, p: int):
        """Twisted CT stages from stage 2 (mlen=2) on ref [nb, NK, fcols];
        input < 4p in (stage-1-absorbed combine), output canonical-ish
        < 2p (mirrors fused_mx._fwd_ct_stages laziness)."""
        two_p = U32(2 * p)
        pp = U32(p)
        mlen, t = 2, half
        while mlen < nb:
            t //= 2
            for blk in range(mlen):
                e = mlen + blk
                w = tf_ref[q, e][None, :, None]
                w_sh = tfsh_ref[q, e][None, :, None]
                base = 2 * blk * t
                u = ref[base : base + t]
                v = ref[base + t : base + 2 * t]
                u = _cond_sub(u, two_p)  # < 2p
                vw = _cond_sub(_shoup_lazy3(w, w_sh, v, pp), two_p)  # < 2p
                ref[base : base + t] = u + vw  # < 4p
                ref[base + t : base + 2 * t] = u + (two_p - vw)  # < 4p
            mlen *= 2
        for bb in range(nb):  # per-b tail: keeps live temps one slab wide
            x = ref[bb]
            x = _cond_sub(_cond_sub(x, two_p), two_p)
            ref[bb] = _cond_sub(x, two_p)  # < 2p

    def inv_stages(ref, ti_ref, tish_ref, q: int, p: int):
        """GS stages up to (excluding) the last, on ref [nb, NK, icols];
        < 2p in / < 2p out."""
        two_p = U32(2 * p)
        pp = U32(p)
        t, mlen = 1, nb
        while mlen > 2:
            h = mlen // 2
            for blk in range(h):
                e = h + blk
                w = ti_ref[q, e][None, :, None]
                w_sh = tish_ref[q, e][None, :, None]
                base = 2 * blk * t
                u = ref[base : base + t]
                v = ref[base + t : base + 2 * t]
                hi = _cond_sub(u + v, two_p)  # < 2p
                d = u + (two_p - v)  # < 4p
                lo = _cond_sub(_shoup_lazy3(w, w_sh, d, pp), two_p)  # < 2p
                ref[base : base + t] = hi
                ref[base + t : base + 2 * t] = lo
            t *= 2
            mlen = h

    def kernel(*refs):
        if has_shoup:
            (fmat_ref, imat_ref, tf_ref, tfsh_ref, ti_ref, tish_ref,
             acc_lo_ref, acc_hi_ref, brk_ref, brks_ref,
             a_ref, as_ref, b_ref, bs_ref,
             out_lo_ref, out_hi_ref,
             dig_ref, what_ref, est_ref, limb_ref, e_ref,
             wrk_lo_ref, wrk_hi_ref) = refs
            brks_scr = None
        else:
            (fmat_ref, imat_ref, tf_ref, tfsh_ref, ti_ref, tish_ref,
             acc_lo_ref, acc_hi_ref, brk_ref,
             a_ref, as_ref, b_ref, bs_ref,
             out_lo_ref, out_hi_ref,
             dig_ref, what_ref, est_ref, limb_ref, e_ref,
             wrk_lo_ref, wrk_hi_ref, brks_scr) = refs
            brks_ref = None
        s = pl.program_id(1)
        gt = g_tile

        @pl.when(s == 0)
        def _init():
            wrk_lo_ref[...] = acc_lo_ref[...]
            wrk_hi_ref[...] = acc_hi_ref[...]

        if not has_shoup:
            # derive approximate Shoup companions for this step's brk rows
            # (underestimate <= 1; external products then land in [0,4p),
            # which the 6p < 2^32 accumulation chain absorbs)
            for q in range(npr):
                p = primes[q]
                m = (1 << 64) // p
                m1 = U32(m >> 32)
                m0 = U32(m & 0xFFFFFFFF)
                w = brk_ref[0, :, q]
                brks_scr[:, q] = w * m1 + _mulhi(w, m0)

        # gadget decomposition once per step, shared by all primes
        # (bias-trick variant: no per-level carry chain)
        for r in range(rows):
            for c in range(2):
                digs = _decomp_pairs_bias(wrk_lo_ref[r, c], wrk_hi_ref[r, c], l, log_b)
                for lev in range(l):
                    col = (r * cpl + c * l + lev) * gt
                    d = digs[lev]
                    if nsplit == 1:
                        dig_ref[0, :, :, col : col + gt] = d.astype(jnp.bfloat16)
                    else:
                        d1 = (d + 128) >> 8  # |d1| <= 2^(log_b-9)
                        d0 = d - (d1 << 8)  # |d0| <= 128
                        dig_ref[0, :, :, col : col + gt] = d0.astype(jnp.bfloat16)
                        dig_ref[1, :, :, col : col + gt] = d1.astype(jnp.bfloat16)

        for q in range(npr):  # static prime loop
            p = primes[q]
            pp = U32(p)
            two_p = U32(2 * p)

            # ── per row: forward (stage-1-absorbed matmuls + twisted
            # stages), then external product + (A*B-1) monomial.
            # Each matmul combines to u32 first (limb sums |s| <= 2^22, so
            # t01 <= 2^22 + 2^30 fits i32), then butterflies lazily in u32.
            for r in range(rows):
                rc = r * cpl * gt
                rw = cpl * gt
                def fwd_mm(var, b):
                    """4 limb matmul outputs, summed over digit splits."""
                    outs = []
                    for i in range(4):
                        s = None
                        for sp in range(nsplit):
                            d = jax.lax.dot_general(
                                fmat_ref[q, var, sp, i],
                                dig_ref[sp, b][:, rc : rc + rw],
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32,
                            )
                            s = d if s is None else s + d
                        outs.append(s)
                    return outs

                if nb > 1:
                    # NOTE round-5 negative result: issuing TWO b-pairs'
                    # matmuls before their combines ("software pipelining"
                    # for MXU/VPU overlap) measured SLOWER on chip
                    # (315 -> 351 us/step-row at rows=2, 331 -> 561 at
                    # rows=1) -- the extra 8 MB of live f32 matmul outputs
                    # spill; Mosaic schedules the single-pair form better.
                    for b in range(half):
                        s0 = fwd_mm(0, b)
                        s1 = fwd_mm(1, b + half)
                        a2 = _cond_sub(_cond_sub(_combine_fwd(s0, p), two_p), two_p)
                        b2 = _cond_sub(_cond_sub(_combine_fwd(s1, p), two_p), two_p)
                        what_ref[b] = a2 + b2  # < 4p (stages tolerate)
                        what_ref[b + half] = a2 + (two_p - b2)  # < 4p
                    fwd_stages(what_ref, tf_ref, tfsh_ref, q, p)
                else:
                    what_ref[0] = _cond_sub(
                        _cond_sub(_combine_fwd(fwd_mm(0, 0), p), two_p), two_p
                    )  # < 2p

                for cout in range(2):
                    def ext_product(m):
                        # approximate-Shoup terms (< 3p), accumulator
                        # reduced to < 2p before each add so the running
                        # sum stays < 5p < 2^32 (modring.PRIMES).
                        # m may be a traced member index (block fori).
                        eh = None
                        for j in range(cpl):
                            col = j * gt
                            w = brk_ref[0, m, q, j, cout][:, :, None]
                            if has_shoup:
                                w_sh = brks_ref[0, m, q, j, cout][:, :, None]
                            else:
                                w_sh = brks_scr[m, q, j, cout][:, :, None]
                            prod = _shoup_lazy3(
                                w, w_sh, what_ref[:, :, col : col + gt], pp
                            )
                            if eh is None:
                                eh = prod  # < 3p
                            else:
                                # < 5p at loop top -> two cond_subs -> < 2p
                                eh = _cond_sub(_cond_sub(eh, two_p), two_p) + prod
                        # eh < 5p; reduce to < 2p for the monomial
                        return _cond_sub(_cond_sub(eh, two_p), two_p)  # < 2p

                    def mono_mul(m, eh):
                        """A_m * B_m * eh, < 3p."""
                        av = a_ref[0, m, q][None]  # [1, NK, gt]
                        avs = as_ref[0, m, q][None]
                        bv = b_ref[0, m, q][:, None]  # [nb, 1, gt]
                        bvs = bs_ref[0, m, q][:, None]
                        t1 = _shoup_lazy3(av, avs, eh, pp)  # < 3p
                        return _shoup_lazy3(bv, bvs, t1, pp)  # < 3p

                    ocol = (cout * rows + r) * gt
                    if ell == 1:
                        eh = ext_product(0)
                        t2 = mono_mul(0, eh)
                        est_ref[:, :, ocol : ocol + gt] = _cond_sub(
                            _cond_sub(t2 + (two_p - eh), two_p), two_p
                        )  # (A*B - 1) * eh: t2 + (2p - eh) < 5p -> < 2p
                    else:
                        # block: U = sum_m A*B*eh_m (< 5p invariant),
                        # V = sum_m eh_m (< 4p invariant); accumulate IN
                        # est_ref, and run the members under a fori_loop
                        # with a dynamic member index -- the fully
                        # unrolled form tripled Mosaic's scoped-VMEM
                        # temporaries past the 128 MB chip budget.
                        vcol = half_cols + ocol
                        zero = jnp.zeros((nb, NK, gt), U32)
                        est_ref[:, :, ocol : ocol + gt] = zero
                        est_ref[:, :, vcol : vcol + gt] = zero

                        def member_body(m, _):
                            eh = ext_product(m)  # < 2p
                            t2 = mono_mul(m, eh)  # < 3p
                            u = est_ref[:, :, ocol : ocol + gt]
                            est_ref[:, :, ocol : ocol + gt] = (
                                _cond_sub(_cond_sub(u, two_p), two_p) + t2
                            )  # < 5p
                            v = est_ref[:, :, vcol : vcol + gt]
                            est_ref[:, :, vcol : vcol + gt] = (
                                _cond_sub(v, two_p) + eh
                            )  # < 4p
                            return 0

                        jax.lax.fori_loop(0, ell, member_body, 0)
                        u = est_ref[:, :, ocol : ocol + gt]
                        est_ref[:, :, ocol : ocol + gt] = _cond_sub(
                            _cond_sub(u, two_p), two_p
                        )  # < 2p
                        v = est_ref[:, :, vcol : vcol + gt]
                        est_ref[:, :, vcol : vcol + gt] = _cond_sub(
                            _cond_sub(v, two_p), two_p
                        )  # < 2p

            # ── inverse: stages, then per column group (acc x cout):
            # last stage fold + limb split + matmuls (group-chunked to
            # bound the limb scratch) ──
            if nb > 1:
                inv_stages(est_ref, ti_ref, tish_ref, q, p)
            rg = rows * gt
            for grp in range(2 * nacc):
                cc = grp * rg
                if nb > 1:
                    for b in range(half):
                        u = est_ref[b][:, cc : cc + rg]
                        v = est_ref[b + half][:, cc : cc + rg]
                        s_ = _cond_sub(_cond_sub(u + v, two_p), pp)  # < p
                        d_ = _cond_sub(_cond_sub(u + (two_p - v), two_p), pp)
                        ls = _split4_bf16(s_)
                        ld = _split4_bf16(d_)
                        for i in range(4):
                            limb_ref[b, i * NK : (i + 1) * NK] = ls[i]
                            limb_ref[b + half, i * NK : (i + 1) * NK] = ld[i]
                else:
                    v = _cond_sub(est_ref[0][:, cc : cc + rg], pp)
                    ls = _split4_bf16(v)
                    for i in range(4):
                        limb_ref[0, i * NK : (i + 1) * NK] = ls[i]
                def inv_mm(b):
                    var = 0 if (nb == 1 or b < half) else 1
                    return [
                        jax.lax.dot_general(
                            imat_ref[q, var, i], limb_ref[b],
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32,
                        )
                        for i in range(4)
                    ]

                for b in range(nb):
                    ss = inv_mm(b)
                    # the last prime's residues reuse est (its stage
                    # outputs for this group are dead after the limb
                    # split)
                    val = _combine_inv(ss, p)  # < p
                    if q == npr - 1:
                        est_ref[b, :, cc : cc + rg] = val
                    else:
                        e_ref[q, b, :, cc : cc + rg] = val

        # ── Garner reconstruction mod 2^64 (u32 pairs) + accumulate ──
        # (balanced Garner as in fused_kms.garner_pairs, exact for any
        # number of primes; e residues are canonical.)  Block (ell > 1):
        # reconstruct U and V separately and accumulate U - V -- the
        # subtraction wraps exactly on the 2^64 torus.
        def _residues(col):
            return lambda bb: [
                est_ref[bb, :, col : col + gt]
                if q == npr - 1
                else e_ref[q, bb, :, col : col + gt]
                for q in range(npr)
            ]

        for cout in range(2):
            for r in range(rows):
                col = (cout * rows + r) * gt
                u_rs = _residues(col)
                v_rs = _residues(half_cols + col) if ell > 1 else None
                for bb in range(nb):  # per-b: keeps Garner temps small
                    dlo, dhi = garner_pairs(u_rs(bb), ctx)
                    if ell > 1:
                        elo, ehi = garner_pairs(v_rs(bb), ctx)
                        dlo, dhi = _pair_sub(dlo, dhi, elo, ehi)
                    alo, ahi = _pair_add(
                        wrk_lo_ref[r, cout, bb], wrk_hi_ref[r, cout, bb], dlo, dhi
                    )
                    wrk_lo_ref[r, cout, bb] = alo
                    wrk_hi_ref[r, cout, bb] = ahi

        @pl.when(s == n_steps - 1)
        def _flush():
            out_lo_ref[...] = wrk_lo_ref[...]
            out_hi_ref[...] = wrk_hi_ref[...]

    def sweep(acc_lo, acc_hi, brk, brk_sh, a_fac, a_sh, b_fac, b_sh):
        g = acc_lo.shape[-1]
        gt = g_tile
        assert g % gt == 0, (
            f"batch {g} must be a multiple of the kernel's g_tile {gt} "
            "(the body hardcodes g_tile strides; resolve g_tile before "
            "building the kernel, as kms_phase1_mx3 does)"
        )
        assert has_shoup == (brk_sh is not None)
        acc_shape = (rows, 2, nb, NK, gt)
        brk_spec = pl.BlockSpec(
            (1, ell, npr, cpl, 2, nb, NK),
            lambda b, s: (s, 0, 0, 0, 0, 0, 0),
            memory_space=pltpu.VMEM,
        )
        in_specs = [
            pl.BlockSpec(fmat.shape, lambda b, s: (0,) * 6, memory_space=pltpu.VMEM),
            pl.BlockSpec(imat.shape, lambda b, s: (0,) * 5, memory_space=pltpu.VMEM),
            pl.BlockSpec(tf.shape, lambda b, s: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tf.shape, lambda b, s: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tf.shape, lambda b, s: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(tf.shape, lambda b, s: (0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(acc_shape, lambda b, s: (0, 0, 0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec(acc_shape, lambda b, s: (0, 0, 0, 0, b), memory_space=pltpu.VMEM),
            brk_spec,
        ] + ([brk_spec] if has_shoup else []) + [
            pl.BlockSpec((1, ell, npr, NK, gt), lambda b, s: (s, 0, 0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ell, npr, NK, gt), lambda b, s: (s, 0, 0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ell, npr, nb, gt), lambda b, s: (s, 0, 0, 0, b), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, ell, npr, nb, gt), lambda b, s: (s, 0, 0, 0, b), memory_space=pltpu.VMEM),
        ]
        scratch = [
            pltpu.VMEM((nsplit, nb, NK, rows * cpl * g_tile), jnp.bfloat16),  # dig
            pltpu.VMEM((nb, NK, cpl * g_tile), U32),  # what (per row)
            pltpu.VMEM((nb, NK, icols), U32),  # est (inverse staging)
            pltpu.VMEM((nb, 4 * NK, rows * g_tile), jnp.bfloat16),  # inv limbs (one group)
            pltpu.VMEM((npr - 1, nb, NK, icols), U32),  # e residues (last prime reuses est)
            pltpu.VMEM(acc_shape, U32),  # resident acc lo
            pltpu.VMEM(acc_shape, U32),  # resident acc hi
        ] + ([] if has_shoup else [
            pltpu.VMEM((ell, npr, cpl, 2, nb, NK), U32)  # derived companions
        ])
        args = [fmat, imat, tf, tf_sh, ti, ti_sh, acc_lo, acc_hi, brk]
        if has_shoup:
            args.append(brk_sh)
        args += [a_fac, a_sh, b_fac, b_sh]
        return x32_trace(pl.pallas_call(
            kernel,
            out_shape=(
                jax.ShapeDtypeStruct(acc_lo.shape, U32),
                jax.ShapeDtypeStruct(acc_hi.shape, U32),
            ),
            grid=(g // gt, n_steps),
            in_specs=in_specs,
            out_specs=(
                pl.BlockSpec(acc_shape, lambda b, s: (0, 0, 0, 0, b), memory_space=pltpu.VMEM),
                pl.BlockSpec(acc_shape, lambda b, s: (0, 0, 0, 0, b), memory_space=pltpu.VMEM),
            ),
            scratch_shapes=scratch,
            input_output_aliases={6: 0, 7: 1},
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=116 * 1024 * 1024
            ),
            interpret=interpret,
        ))(*args)

    return sweep


# ─── key material & driver ────────────────────────────────────────────────


def mx3_nprimes(params) -> int:
    """Exact CRT prime count for the mx3 phase-1 engine.

    Binary-key presets fuse the monomial as (A*B - 1), doubling the
    reconstruction bound (as mx/mx2).  Block presets use the U/V split
    (see make_mx3_sweep_kernel), whose per-accumulator bound carries the
    ell member sum instead of the factor 2."""
    from ..ring.context import nprimes_needed
    from ..schemes.params import KmsBlockParams

    half_b = 1 << (params.log_b_gsw - 1)
    if isinstance(params, KmsBlockParams):
        nt = params.l_gsw * 2 * params.ell
    else:
        nt = params.l_gsw * 2 * 2
    return nprimes_needed(params.ring_torus_bits, params.big_n, [(half_b, nt)])


# mx3 consumes the same exact mx-domain key material as mx2; reuse its
# builder and container (one conversion serves both engines).  Block
# presets differ only in the prime count (U/V-split bound).
Mx3KmsKeys = MxKmsKeys


def build_mx3_kms_keys(party_keys, params, chunk: int = 80, store_shoup: bool = True, consume_brk: bool = False) -> Mx3KmsKeys:
    return build_mx_kms_keys(
        party_keys, params, chunk=chunk, npr=mx3_nprimes(params),
        store_shoup=store_shoup, consume_brk=consume_brk,
    )


def kms_phase1_mx3(tildea_p, brk_p, brk_sh_p, iter_rows: int, params, out_ctx: RingCtx, g_tile: int = 128, interpret: bool = False, derive_mid: bool = False):
    """mx3 KMS phase 1 for one party (same contract as kms_phase1_mx2).

    Handles both the binary-key rotation (KmsParams) and the block-binary
    variant (KmsBlockParams: one decomposition + forward NTT per d-block
    shared by ell members, the reference's bootstrapping.jl:599-659).

    Bit-identical to kms.phase1 / kms.phase1_block / kms_phase1_mx2 --
    same exact integers (tests/test_fused_mx3.py) -- unless derive_mid is
    set.

    derive_mid (l_lev == 3 only): sweep rows 0 and 2 and DERIVE row 1 as
    2^log_b_lev * row2 on the torus (the RLEV messages satisfy
    gvec_1 = B_lev * gvec_2 exactly, and torus scaling is ct-homomorphic),
    skipping one of three row sweeps.  **Measured negative result**: row 1
    then carries B_lev * row2's rotation noise, and phase 2's LEV
    contraction amplifies per-levkey noise ~2^22x (measured via the
    truncated-key experiment, module docstring) -- at KMS8party this
    lands below the 6-sigma bar (decrypt failures at batch 128, 48.4
    boots/s vs 33.2 exact).  Kept for measurement; NOT a valid default.
    """
    from ..ciphertext.rlwe import gadget_gvec
    from ..ring.ntt import fwd_ntt
    from ..ring.torus import lift
    from ..schemes.params import KmsBlockParams

    npr = brk_p.shape[1]
    assert npr == mx3_nprimes(params), (
        f"brk prime count {npr} != exact CRT count {mx3_nprimes(params)}"
    )
    ctx_p = make_ring_ctx(params.big_n, params.ring_torus_bits, npr)
    plan = mx_plan(ctx_p.n, npr)
    nb = plan.nb
    g = tildea_p.shape[0]
    n = params.big_n
    ell = params.ell if isinstance(params, KmsBlockParams) else 1
    n_steps = tildea_p.shape[1] // ell
    g_tile = min(g_tile, g)
    assert g % g_tile == 0, f"batch {g} not a multiple of g_tile {g_tile}"

    derive_mid = (
        bool(derive_mid) and iter_rows == 3 and params.l_lev == 3 and ell == 1
    )
    out_rows = iter_rows
    gvec = gadget_gvec(params.l_lev, params.log_b_lev, ctx_p.dtype)[:iter_rows]
    if derive_mid:
        gvec = gvec[jnp.array([0, 2])]  # sweep rows 0 and 2 only
        iter_rows = 2
    acc_lo = jnp.zeros((iter_rows, 2, nb, NK, g), dtype=U32)
    acc_hi = jnp.zeros((iter_rows, 2, nb, NK, g), dtype=U32)
    acc_lo = acc_lo.at[:, 0, 0, 0, :].set((gvec & jnp.uint64(0xFFFFFFFF)).astype(U32)[:, None])
    acc_hi = acc_hi.at[:, 0, 0, 0, :].set((gvec >> 32).astype(U32)[:, None])

    # key row i = ell*block + member, matching the reference's
    # brk.reshape(d, ell, ...) / ta.reshape(d, ell) blocking
    has_shoup = brk_sh_p is not None
    brk_steps = brk_p.reshape(n_steps, ell, npr, -1, 2, nb, NK)
    brk_sh_steps = brk_sh_p.reshape(*brk_steps.shape) if has_shoup else None
    a_fac, a_sh, b_fac, b_sh = _gather_mono_factors(
        tildea_p.astype(jnp.int32), n, npr
    )
    a_fac = a_fac.reshape(n_steps, ell, *a_fac.shape[1:])
    a_sh = a_sh.reshape(*a_fac.shape)
    b_fac = b_fac.reshape(n_steps, ell, *b_fac.shape[1:])
    b_sh = b_sh.reshape(*b_fac.shape)

    # Row-chunked sweeps: the RLEV rows never interact during the
    # rotation, so they run as separate kernel calls.  Two rows per body
    # lets Mosaic overlap one row's matmuls with the other row's VPU
    # chain; the full 3-row body exceeds the v5e scoped-vmem budget, and
    # a 2-row BLOCK body wedged the remote Mosaic compiler (>40 min, no
    # result) -- block presets sweep one row per call.
    max_rows = 1 if ell > 1 else 2
    chunks = []
    left = iter_rows
    while left > 0:
        c = min(max_rows, left)
        chunks.append(c)
        left -= c
    sweeps = {c: make_mx3_sweep_kernel(params, ctx_p, c, n_steps, g_tile, interpret,
                                       ell=ell, has_shoup=has_shoup)
              for c in set(chunks)}
    outs_lo, outs_hi = [], []
    r0 = 0
    for c in chunks:
        lo, hi = sweeps[c](
            acc_lo[r0 : r0 + c], acc_hi[r0 : r0 + c],
            brk_steps, brk_sh_steps, a_fac, a_sh, b_fac, b_sh,
        )
        outs_lo.append(lo)
        outs_hi.append(hi)
        r0 += c
    acc_lo = jnp.concatenate(outs_lo, axis=0) if len(outs_lo) > 1 else outs_lo[0]
    acc_hi = jnp.concatenate(outs_hi, axis=0) if len(outs_hi) > 1 else outs_hi[0]
    acc = acc_lo.astype(jnp.uint64) | (acc_hi.astype(jnp.uint64) << 32)
    acc = from_mx_order(acc.reshape(iter_rows, 2, n, g).swapaxes(-1, -2), nb)
    acc_std = jnp.transpose(acc, (2, 0, 1, 3))  # [G, rows, 2, N]
    if derive_mid:
        # row 1 := B_lev * row 2 on the torus (mod 2^64 shift)
        mid = acc_std[:, 1] << jnp.uint64(params.log_b_lev)
        acc_std = jnp.stack(
            [acc_std[:, 0], mid, acc_std[:, 1]], axis=1
        )  # [G, 3, 2, N]
    return fwd_ntt(lift(acc_std, out_ctx.crt), out_ctx.plan)


@functools.partial(jax.jit, static_argnames=("params", "interpret", "pallas_ntt", "g_tile", "derive_mid"))
def bootstrap_mx3(ct, scheme, mx_keys: Mx3KmsKeys, params, interpret: bool = False, pallas_ntt: bool = True, g_tile: int = 128, derive_mid: bool = False):
    """KMS bootstrap with the mx3 phase-1 engine (phase 2 / key switch as
    in schemes.kms).  Serves both KmsParams and KmsBlockParams -- the
    phase-1 sweep dispatches on the preset type; phase 2 and the key
    switch are shared.  derive_mid: see kms_phase1_mx3 (l_lev == 3
    binary-key presets sweep 2 of 3 RLEV rows and derive the middle one
    -- a measured noise-for-speed trade BELOW the 6-sigma margin bar at
    KMS8; kept for measurement only)."""
    from ..schemes.common import initial_acc, mod_switch_2n
    from ..schemes.kms import _ctx, _keyswitch, _phase2_party

    ctx = _ctx(params)
    k = params.k
    tildeb, tildea = mod_switch_2n(ct, params.big_n)
    g = tildea.shape[0]
    tild = jnp.moveaxis(tildea.reshape(g, k, params.n), 1, 0)  # [k, G, n]

    sh = mx_keys.brk_mx_shoup
    has_shoup = sh is not None and getattr(sh, "ndim", 0) > 1
    lev0 = kms_phase1_mx3(
        tild[0], mx_keys.brk_mx[0], sh[0] if has_shoup else None,
        1, params, ctx, g_tile=g_tile, interpret=interpret,
    )
    if k > 1:
        if has_shoup:
            lev_rest = jax.lax.map(
                lambda xs: kms_phase1_mx3(
                    xs[0], xs[1], xs[2], params.l_lev, params, ctx,
                    g_tile=g_tile, interpret=interpret, derive_mid=derive_mid,
                ),
                (tild[1:], mx_keys.brk_mx[1:], sh[1:]),
            )
        else:
            lev_rest = jax.lax.map(
                lambda xs: kms_phase1_mx3(
                    xs[0], xs[1], None, params.l_lev, params, ctx,
                    g_tile=g_tile, interpret=interpret, derive_mid=derive_mid,
                ),
                (tild[1:], mx_keys.brk_mx[1:]),
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
