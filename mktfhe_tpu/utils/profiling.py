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
