"""Profiling and roofline accounting.

The reference's only performance machinery is `@time` prints
(/root/reference/test/KMS.jl:36).  Here: a jax.profiler trace context for
TensorBoard-compatible device traces, plus a static cost model of the
blind-rotation hot path for roofline comparison (BASELINE.md item 4).
"""

from __future__ import annotations

import contextlib
import dataclasses
import math

import jax


@contextlib.contextmanager
def trace(logdir: str = "/tmp/mktfhe_trace"):
    """Device trace around a region: view with tensorboard/xprof."""
    jax.profiler.start_trace(logdir)
    try:
        yield logdir
    finally:
        jax.profiler.stop_trace()


@dataclasses.dataclass
class BootstrapCost:
    """Static per-gate cost model of a blind rotation + key switch."""

    ntt_elems: int  # element-passes through NTT butterflies
    vpu_ops: int  # estimated scalar int ops on the VPU
    mxu_macs: int  # int8 MACs in the key switch
    hbm_bytes: int  # bootstrapping-key bytes streamed per batch

    def summary(self, batch: int, measured_s: float, peak_vpu=4e12, peak_mxu=394e12, peak_hbm=8.2e11):
        per_gate = measured_s / batch
        return {
            "ms_per_gate": per_gate * 1e3,
            "vpu_bound_ms": self.vpu_ops / peak_vpu * 1e3,
            "mxu_bound_ms": self.mxu_macs / peak_mxu * 1e3,
            "hbm_bound_ms_batch": self.hbm_bytes / peak_hbm * 1e3,
            "vpu_utilization": self.vpu_ops / peak_vpu / per_gate,
        }


def kms_cost(params, engine: str = "mx", nprimes: int = 3) -> BootstrapCost:
    """Per-gate cost of a KMS two-phase bootstrap (SURVEY.md section 3.3,
    bootstrapping.jl:369-558).

    engine: 'ref'/'bm' count the NTT butterflies as VPU ops (a Shoup modmul
    is ~11 u32 lane ops, a butterfly ~14); 'mx'/'mx2' move the 128-point
    factor of each transform onto the MXU as bf16 limb matmuls
    (kernels/mx_ntt.py) leaving ~s_count VPU stages of the nb-point factor
    plus pointwise work (mx2 restructures the sweep, same per-step math).
    """
    n, big_n, k = params.n, params.big_n, params.k
    l, l_lev, l_uni = params.l_gsw, params.l_lev, params.l_uni
    logn = int(math.log2(big_n))
    cpl = 2 * l  # decomposed digit polys per step (2 components x l)
    rows = l_lev  # uniform RLEV rows in phase 1

    # phase 1, per party per step: cpl fwd + 2 inv transforms, 2*cpl*2
    # pointwise muls, mono weight, decomp+Garner overhead
    fwd_elems = cpl * nprimes * big_n * logn // 2  # butterflies
    inv_elems = 2 * nprimes * big_n * logn // 2
    pointwise = nprimes * big_n * (cpl * 2 + 2)
    glue = big_n * (10 * cpl + 30)  # decomp digits + Garner + u64 adds
    if engine in ("mx", "mx2"):
        from ..kernels.fused_mx2 import _digit_split

        nb = big_n // 128
        s_count = int(math.log2(nb)) if nb > 1 else 0
        # VPU keeps: nb-point stages + twiddle + combine (~6 ops/elem) and
        # the pointwise/glue terms
        stage_elems = (cpl + 2) * nprimes * big_n * (s_count + 2) // 2
        vpu_step = stage_elems * 14 + pointwise * 11 + glue
        nsplit = _digit_split(params.log_b_gsw)
        mxu_step = nprimes * 128 * 128 * (
            cpl * nb * 4 * nsplit + 2 * nb * 16
        )
    else:
        vpu_step = (fwd_elems + inv_elems) * 14 + pointwise * 11 + glue
        mxu_step = 0
    p1_vpu = k * rows * n * vpu_step
    p1_mxu = k * rows * n * mxu_step

    # phase 2, party p1: LEV contract (p1*l_lev fwd + 2 inv round trips),
    # hybrid product (~(p1*l_uni + l_uni) fwd + 2 inv + p1+2 out inv)
    p2_ntt_polys = sum(
        p1 * l_lev + 2 + p1 * l_uni + l_uni + (p1 + 2) for p1 in range(1, k + 1)
    )
    p2_vpu = p2_ntt_polys * nprimes * big_n * logn // 2 * 14

    ks_macs = 4 * k * params.f * big_n * (n + 1)
    brk_bytes = k * n * nprimes * cpl * 2 * big_n * 4 * 2
    return BootstrapCost(
        ntt_elems=(fwd_elems + inv_elems) * 2 * k * rows * n,
        vpu_ops=p1_vpu + p2_vpu,
        mxu_macs=p1_mxu + ks_macs,
        hbm_bytes=brk_bytes,
    )


def lmss_cost(params, nprimes: int = 2) -> BootstrapCost:
    """Per-gate cost of an LMSS block-binary bootstrap
    (bootstrapping.jl:114-165): one decomposition + (k+1)*l forward
    transforms per BLOCK (d blocks), ell monomial-weighted external
    products accumulated in the evaluation domain, then k+1 inverses."""
    big_n, k, l, d, ell = params.big_n, params.k, params.l_gsw, params.d, params.ell
    logn = int(math.log2(big_n))
    fwd = (k + 1) * l * nprimes * big_n * logn // 2
    inv = (k + 1) * nprimes * big_n * logn // 2
    # per member: external product (k+1)^2*l products + monomial weight
    pointwise = ell * big_n * nprimes * ((k + 1) * (k + 1) * l + (k + 1))
    per_block = (fwd + inv) * 14 + pointwise * 11 + big_n * 40
    vpu = d * per_block
    tail = k * big_n - d * ell  # coefficients beyond the free head
    ks_macs = 4 * tail * params.f * (1 << (params.log_d - 1)) * (d * ell + 1)
    brk_bytes = d * ell * (k + 1) * l * (k + 1) * nprimes * big_n * 4 * 2
    return BootstrapCost(
        ntt_elems=d * (fwd + inv) * 2,
        vpu_ops=vpu,
        mxu_macs=ks_macs,
        hbm_bytes=brk_bytes,
    )


def ccs_cost(params, nprimes: int = 2) -> BootstrapCost:
    """Per-gate cost of a CCS hybrid-product bootstrap
    (bootstrapping.jl:234-328): for party index idx (1-based), each of n
    steps decomposes idx+1 components (l digits each), forward-transforms
    them twice (acc digits, then v digits), computes u/v/w pointwise, and
    inverse-transforms v (idx+1) and the output (idx+1)."""
    n, big_n, k, l = params.n, params.big_n, params.k, params.l_uni
    logn = int(math.log2(big_n))
    vpu = 0
    ntt_elems = 0
    for idx in range(1, k + 1):
        comps = idx + 1
        fwd = 2 * comps * l * nprimes * big_n * logn // 2  # acc + v digits
        inv = 2 * comps * nprimes * big_n * logn // 2  # v + output
        # u: comps*l products; v: comps*l; w: 2*comps*l (b and a rows)
        pointwise = big_n * nprimes * (4 * comps * l + 2)
        vpu += n * ((fwd + inv) * 14 + pointwise * 11 + big_n * 40)
        ntt_elems += n * (fwd + inv) * 2
    ks_macs = 4 * k * big_n * params.f * (1 << (params.log_d - 1)) * (n + 1)
    brk_bytes = k * n * l * 3 * nprimes * big_n * 4 * 2  # d + f stacks
    return BootstrapCost(
        ntt_elems=ntt_elems,
        vpu_ops=vpu,
        mxu_macs=ks_macs,
        hbm_bytes=brk_bytes,
    )


def cggi_cost(params, nprimes: int = 2) -> BootstrapCost:
    """Per-gate cost of a CGGI bootstrap (see SURVEY.md section 3.3)."""
    n, big_n, k, l = params.n, params.big_n, params.k, params.l_gsw
    logn = int(math.log2(big_n))
    fwd = (k + 1) * l * nprimes * big_n * logn  # butterfly elements
    inv = (k + 1) * nprimes * big_n * logn
    pointwise = big_n * nprimes * (k + 1) * (k + 1) * l
    per_step = (fwd + inv) // 2 * 14 + pointwise * 16
    vpu = n * per_step
    ks_macs = 4 * (k * big_n * params.f) * (n + 1)
    brk_bytes = n * (k + 1) * l * (k + 1) * nprimes * big_n * 4 * 2
    return BootstrapCost(
        ntt_elems=n * (fwd + inv),
        vpu_ops=vpu,
        mxu_macs=ks_macs,
        hbm_bytes=brk_bytes,
    )
