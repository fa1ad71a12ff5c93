"""Batch-minor blind-rotation engine (Pallas NTT + lane-friendly layout).

Alternative hot path for the gate-bootstrap scan: all per-step tensors keep
the gate batch as the minor (lane) dimension -- [.., N, G] -- so butterflies
and modular arithmetic vectorize without lane shuffles, and the NTT stages
run fused in VMEM (kernels/ntt_pallas.py).  Layout conversion happens once
per bootstrap (not per step).

The monomial weight (X^a - 1) is applied in the NTT domain via the
precomputed table (as in LMSS), because a per-gate negacyclic roll would
need per-lane shifts in this layout.  This doubles the reconstruction
bound, which the CRT-range check accounts for (params.nprimes uses the
worst contraction; CGGI has > 7 bits of margin).

Bit-identical to the reference engine (schemes/cggi.py) -- see
tests/test_batchminor.py.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp

from ..ciphertext.decomp import balanced_decomp
from ..ciphertext.lwe import Lwe
from ..ring.context import RingCtx, make_ring_ctx
from ..ring.modring import modsum, shoup_mul
from ..ring.torus import bits_of
from .ntt_pallas import fwd_ntt_pallas, inv_ntt_pallas

U32 = jnp.uint32
U64 = jnp.uint64


def _p_col(ctx: RingCtx):
    """Primes broadcastable over [npr, ..., N, G]."""
    import numpy as np

    return np.asarray(ctx.plan.primes).reshape(-1, 1, 1, 1)


def lift_signed_bm(d, ctx: RingCtx):
    """int32 digits [R, N, G] -> residues [npr, R, N, G]."""
    p = _p_col(ctx).astype("int32")
    return jnp.where(d[None] < 0, d[None] + p, d[None]).astype(U32)


def from_crt_bm(r, ctx: RingCtx, dtype):
    """Garner in batch-minor layout: [npr, C, N, G] -> [C, N, G] torus."""
    from ..ring.modring import reduce_u32, submod
    from ..ring.torus import CrtPlan

    plan: CrtPlan = ctx.crt
    m = plan.nprimes
    import numpy as np

    ps = [int(p) for p in np.asarray(plan.primes)]
    t = [r[0]]
    for i in range(1, m):
        u = r[i]
        for j in range(i):
            w, w_sh = plan.inv_pj[i][j]
            u = shoup_mul(
                U32(w), U32(w_sh), submod(u, reduce_u32(t[j], ps[i]), ps[i]), ps[i]
            )
        t.append(u)
    if bits_of(dtype) == 32:
        x = t[-1]
        for i in range(m - 2, -1, -1):
            x = t[i] + U32(ps[i]) * x
        neg = t[-1] >= U32(ps[-1] // 2)
        return jnp.where(neg, x - U32(plan.prod_mod32), x)
    x = t[-1].astype(U64)
    for i in range(m - 2, -1, -1):
        x = t[i].astype(U64) + U64(ps[i]) * x
    neg = t[-1] >= U32(ps[-1] // 2)
    return jnp.where(neg, x - U64(plan.prod_mod64), x)


def decomp_hat_bm(acc, l: int, log_b: int, ctx: RingCtx, interpret: bool = False):
    """acc [C, N, G] -> NTT'd digits [npr, C*l, N, G]."""
    c, n, g = acc.shape
    d = balanced_decomp(acc, l, log_b)  # [C, N, G, l]
    d = jnp.moveaxis(d, -1, 1).reshape(c * l, n, g)
    res = lift_signed_bm(d, ctx)
    return fwd_ntt_pallas(res, ctx.plan, g_tile=min(g, 128), interpret=interpret)


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BmScheme:
    """CGGI scheme state in batch-minor-friendly form.

    brk_bm: [n, npr, cin*l, cout, N] (+ shoup) -- per-step slices broadcast
    against dhat [npr, cin*l, 1, N, G].  mono: [2N, npr, N] (+ shoup).
    ksk as in schemes/cggi.py.
    """

    brk_bm: jnp.ndarray
    brk_bm_shoup: jnp.ndarray
    mono_hat: jnp.ndarray
    mono_shoup: jnp.ndarray
    ksk_b: jnp.ndarray
    ksk_a: jnp.ndarray


def convert_scheme(scheme, params) -> BmScheme:
    """Re-layout a CggiScheme for the batch-minor engine."""
    from ..schemes.lmss import monomial_table

    ctx = make_ring_ctx(params.big_n, params.torus_bits, params.nprimes)
    n_bits, cin, l, cout, npr, n = scheme.brk_hat.shape

    def relay(b):
        # [n, cin, l, cout, npr, N] -> [n, npr, cin*l, cout, N]
        return jnp.transpose(b, (0, 4, 1, 2, 3, 5)).reshape(
            n_bits, npr, cin * l, cout, n
        )

    mono_hat, mono_shoup = monomial_table(ctx)
    return BmScheme(
        brk_bm=relay(scheme.brk_hat),
        brk_bm_shoup=relay(scheme.brk_shoup),
        mono_hat=mono_hat,
        mono_shoup=mono_shoup,
        ksk_b=scheme.ksk_b,
        ksk_a=scheme.ksk_a,
    )


def blind_rotate_bm(acc, tildea, scheme: BmScheme, params, ctx: RingCtx, interpret=False):
    """CGGI blind rotation in batch-minor layout.

    acc: [k+1, N, G]; tildea: [G, n].  Per step: decompose+NTT (Pallas),
    pointwise external product with the monomial weight folded in, inverse
    NTT (Pallas), reconstruct, accumulate.
    """
    l, log_b = params.l_gsw, params.log_b_gsw
    p = _p_col(ctx)

    def step(acc, xs):
        brk_h, brk_s, ta = xs  # [npr, cin*l, cout, N], ta [G]
        dhat = decomp_hat_bm(acc, l, log_b, ctx, interpret)  # [npr, cin*l, N, G]
        prods = shoup_mul(
            brk_h[..., None], brk_s[..., None], dhat[:, :, None], p[..., None]
        )  # [npr, cin*l, cout, N, G]
        ehat = modsum(prods, 1, jnp.asarray(p))  # [npr, cout, N, G]
        mono = jnp.transpose(scheme.mono_hat[ta], (1, 2, 0))  # [npr, N, G]
        mono_s = jnp.transpose(scheme.mono_shoup[ta], (1, 2, 0))
        weighted = shoup_mul(mono[:, None], mono_s[:, None], ehat, p)
        e = inv_ntt_pallas(weighted, ctx.plan, g_tile=min(acc.shape[-1], 128), interpret=interpret)
        delta = from_crt_bm(e, ctx, ctx.dtype)  # [cout, N, G]
        return acc + delta, None

    acc, _ = jax.lax.scan(
        step, acc, (scheme.brk_bm, scheme.brk_bm_shoup, tildea.T)
    )
    return acc


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class BmKmsPhase1:
    """KMS phase-1 keys in batch-minor form.

    brk_bm: [k, n, npr', 2*l_gsw, 2, N] (+ shoup); npr' may exceed the
    scheme's ring prime count because the evaluation-domain monomial weight
    doubles the reconstruction bound (vs the roll used by the reference
    engine); the phase-1 output re-enters the standard prime basis through
    the torus domain, so phase 2 is unaffected.
    """

    brk_bm: jnp.ndarray
    brk_bm_shoup: jnp.ndarray
    mono_hat: jnp.ndarray
    mono_shoup: jnp.ndarray


def build_bm_kms_phase1(party_keys, params) -> BmKmsPhase1:
    """Convert KMS party keys (torus domain) for the batch-minor phase 1."""
    from ..ring.context import nprimes_needed
    from ..ring.ntt import fwd_ntt, shoup_pair
    from ..ring.torus import lift
    from ..schemes.lmss import monomial_table

    half_b = 1 << (params.log_b_gsw - 1)
    npr = nprimes_needed(
        params.ring_torus_bits, params.big_n, [(half_b, params.l_gsw * 2 * 2)]
    )
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, npr)

    def relay(b):
        n_bits, cin, l, cout, nq, nn = b.shape
        return jnp.transpose(b, (0, 4, 1, 2, 3, 5)).reshape(
            n_bits, nq, cin * l, cout, nn
        )

    @jax.jit
    def one_party(brk_p):  # [n, 2, l, 2, N] u64
        hat = fwd_ntt(lift(brk_p, ctx.crt), ctx.plan)
        return relay(hat), relay(shoup_pair(hat, ctx.plan))

    # per-party conversion keeps the peak HBM at one party's intermediates
    # (the k-stacked lift+NTT would spike several GB at k=8)
    hats, shs = [], []
    for pk in party_keys:
        h, s = one_party(pk.brk)
        jax.block_until_ready(h)
        hats.append(h)
        shs.append(s)

    mono_hat, mono_shoup = monomial_table(ctx)
    return BmKmsPhase1(
        brk_bm=jnp.stack(hats),
        brk_bm_shoup=jnp.stack(shs),
        mono_hat=mono_hat,
        mono_shoup=mono_shoup,
    )


def kms_phase1_bm(tildea_p, brk_p, brk_sh_p, phase1_keys: BmKmsPhase1, iter_rows: int, params, out_ctx: RingCtx, interpret: bool = False):
    """Batch-minor KMS phase 1 for one party (cf. schemes/kms.py:phase1).

    tildea_p: [G, n]; brk_p: [n, npr', 2l, 2, N].  Returns the party's lev
    key in the *standard* prime basis: [G, iter_rows, 2, npr, N].
    """
    from ..ciphertext.rlwe import gadget_gvec
    from ..ring.ntt import fwd_ntt
    from ..ring.torus import lift

    npr_p = brk_p.shape[1]
    ctx_p = make_ring_ctx(params.big_n, params.ring_torus_bits, npr_p)
    g = tildea_p.shape[0]
    n = params.big_n
    l = params.l_gsw
    p = _p_col(ctx_p)

    gvec = gadget_gvec(params.l_lev, params.log_b_lev, ctx_p.dtype)[:iter_rows]
    acc = jnp.zeros((iter_rows, 2, n, g), dtype=ctx_p.dtype)
    acc = acc.at[:, 0, 0, :].set(gvec[:, None])

    def step(acc, xs):
        brk_h, brk_s, ta = xs  # [npr', 2l, 2, N], ta [G]
        flat = acc.reshape(iter_rows * 2, n, g)
        dhat = decomp_hat_bm(flat, l, params.log_b_gsw, ctx_p, interpret)
        dhat = dhat.reshape(npr_p, iter_rows, 2 * l, n, g)
        prods = shoup_mul(
            brk_h[:, None, :, :, :, None],
            brk_s[:, None, :, :, :, None],
            dhat[:, :, :, None],
            p[..., None, None],
        )  # [npr', rows, 2l, 2, N, G]
        ehat = modsum(prods, 2, jnp.asarray(p[..., None]))  # [npr', rows, 2, N, G]
        mono = jnp.transpose(phase1_keys.mono_hat[ta], (1, 2, 0))  # [npr', N, G]
        mono_s = jnp.transpose(phase1_keys.mono_shoup[ta], (1, 2, 0))
        weighted = shoup_mul(mono[:, None, None], mono_s[:, None, None], ehat, p[..., None])
        e = inv_ntt_pallas(
            weighted.reshape(npr_p, iter_rows * 2, n, g),
            ctx_p.plan,
            g_tile=min(g, 128),
            interpret=interpret,
        )
        delta = from_crt_bm(e, ctx_p, ctx_p.dtype).reshape(iter_rows, 2, n, g)
        return acc + delta, None

    acc, _ = jax.lax.scan(step, acc, (brk_p, brk_sh_p, tildea_p.T))
    # back to standard layout + standard prime basis for phase 2
    acc_std = jnp.transpose(acc, (3, 0, 1, 2))  # [G, rows, 2, N]
    return fwd_ntt(lift(acc_std, out_ctx.crt), out_ctx.plan)


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def bootstrap_bm(ct: Lwe, scheme: BmScheme, params, interpret: bool = False) -> Lwe:
    """CGGI gate bootstrap via the batch-minor engine.

    Semantically identical to schemes.cggi.bootstrap (the monomial table
    and the negacyclic roll compute the same exact integers).
    """
    from ..schemes.common import initial_acc, keyswitch_table, mod_switch_2n

    ctx = make_ring_ctx(params.big_n, params.torus_bits, params.nprimes)
    tildeb, tildea = mod_switch_2n(ct, params.big_n)
    acc = initial_acc(tildeb, params.big_n, params.k, ctx.dtype)  # [G, k+1, N]
    acc = jnp.transpose(acc, (1, 2, 0))  # -> [k+1, N, G]
    acc = blind_rotate_bm(acc, tildea, scheme, params, ctx, interpret)
    acc = jnp.transpose(acc, (2, 0, 1))  # -> [G, k+1, N]
    return keyswitch_table(acc, scheme.ksk_b, scheme.ksk_a, params.f, params.log_d)
