"""Pallas TPU kernel: fused negacyclic NTT (all butterfly stages in VMEM).

The jnp NTT (ring/ntt.py) materializes every butterfly stage through HBM
and runs butterflies across the lane dimension (N minor), which forces
lane shuffles.  This kernel uses the TPU-native layout: the *batch* is the
minor (lane) dimension and N lives on sublanes, so a butterfly pairs whole
vector rows; all log2(N) stages run out of VMEM in one kernel launch.

Grid: one program per batch tile; the 2-4 CRT primes are a static loop
inside the kernel (per-prime twiddle tables and modulus).

The transform is bit-identical to ring/ntt.py (same merged-twist CT/GS
formulation, eprint 2016/504), verified by tests/test_pallas.py.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..ring.ntt import NttPlan

U32 = jnp.uint32


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


def _fwd_body(a, psi, psi_sh, p, n):
    """One prime's forward transform; a: [R, N, Gt] values < p."""
    r_dim, _, gt = a.shape
    m = 1
    t = n
    while m < n:
        t //= 2
        x = a.reshape(r_dim, m, 2, t, gt)
        s = psi[m : 2 * m].reshape(1, m, 1, 1)
        s_sh = psi_sh[m : 2 * m].reshape(1, m, 1, 1)
        u = x[:, :, 0]
        v = _shoup(s, s_sh, x[:, :, 1], p)
        hi = u + v
        hi = jnp.where(hi >= p, hi - p, hi)
        lo = u + (p - v)
        lo = jnp.where(lo >= p, lo - p, lo)
        a = jnp.stack([hi, lo], axis=2).reshape(r_dim, n, gt)
        m *= 2
    return a


def _inv_body(a, ipsi, ipsi_sh, ninv, ninv_sh, p, n):
    r_dim, _, gt = a.shape
    t = 1
    m = n
    while m > 1:
        h = m // 2
        x = a.reshape(r_dim, h, 2, t, gt)
        s = ipsi[h : 2 * h].reshape(1, h, 1, 1)
        s_sh = ipsi_sh[h : 2 * h].reshape(1, h, 1, 1)
        u = x[:, :, 0]
        v = x[:, :, 1]
        hi = u + v
        hi = jnp.where(hi >= p, hi - p, hi)
        d = u + (p - v)
        d = jnp.where(d >= p, d - p, d)
        lo = _shoup(s, s_sh, d, p)
        a = jnp.stack([hi, lo], axis=2).reshape(r_dim, n, gt)
        t *= 2
        m = h
    return _shoup(ninv, ninv_sh, a, p)


def _make_call(plan: NttPlan, x, g_tile: int, interpret: bool, forward: bool):
    npr, r_dim, n, g = x.shape
    assert npr == plan.nprimes and n == plan.n
    assert g % g_tile == 0
    primes = [int(p) for p in plan.primes]
    ninvs = [int(v) for v in plan.n_inv]
    ninv_shs = [int(v) for v in plan.n_inv_shoup]

    def kernel(psi_ref, psish_ref, x_ref, o_ref):
        for q in range(npr):
            p = U32(primes[q])
            a = x_ref[q]
            if forward:
                out = _fwd_body(a, psi_ref[q], psish_ref[q], p, n)
            else:
                out = _inv_body(
                    a, psi_ref[q], psish_ref[q], U32(ninvs[q]), U32(ninv_shs[q]), p, n
                )
            o_ref[q, :, :, :] = out

    tab = plan.psi_brv if forward else plan.ipsi_brv
    tab_sh = plan.psi_brv_shoup if forward else plan.ipsi_brv_shoup
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        grid=(g // g_tile,),
        in_specs=[
            pl.BlockSpec((npr, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((npr, n), lambda b: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (npr, r_dim, n, g_tile),
                lambda b: (0, 0, 0, b),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (npr, r_dim, n, g_tile), lambda b: (0, 0, 0, b), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(jnp.asarray(tab), jnp.asarray(tab_sh), x)


def fwd_ntt_pallas(x, plan: NttPlan, g_tile: int = 128, interpret: bool = False):
    """Forward NTT in batch-minor layout: x [npr, R, N, G] -> [npr, R, N, G]."""
    return _make_call(plan, jnp.asarray(x), g_tile, interpret, forward=True)


def inv_ntt_pallas(x, plan: NttPlan, g_tile: int = 128, interpret: bool = False):
    """Inverse NTT in batch-minor layout."""
    return _make_call(plan, jnp.asarray(x), g_tile, interpret, forward=False)
