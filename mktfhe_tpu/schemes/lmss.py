"""LMSS23 single-key bootstrapping with block-binary secrets.

Counterpart of the LMSS pieces of the reference: scheme + setup
(/root/reference/src/tfhe/scheme.jl:168-205), bootstrapping key
(keygen.jl:29-55), blind rotation (bootstrapping.jl:114-165) and partial
key switch (bootstrapping.jl:170-229).

The LWE secret has d blocks of length ell with at most one 1 per block, so
one accumulator decomposition + NTT serves all ell external products of a
block (~ell x fewer NTTs than CGGI).  The monomial weights (X^a - 1) are
applied in the evaluation domain via a precomputed 2N-entry NTT table so
the whole block is accumulated before a single inverse NTT -- exactly the
reference's structure, kept because it is what makes LMSS fast.

The ring key embeds the LWE key in its low coefficients (partial_ring_key),
so the first n extracted coefficients key-switch for free.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..ciphertext.gsw import external_product_hat, rgsw_encrypt, rgsw_to_hat, rlwe_decomp_hat
from ..ciphertext.keys import block_binary_lwe_key, partial_ring_key
from ..ciphertext.lwe import Lwe
from ..ring.context import RingCtx, make_ring_ctx
from ..ring.sampler import rng_streams
from ..ring.modring import addmod, shoup_mul
from ..ring.ntt import fwd_ntt, inv_ntt, shoup_pair
from ..ring.torus import from_crt, lift
from .common import build_ksk, initial_acc, keyswitch_partial, mod_switch_2n
from .params import BlockParams

# top-level sampling streams consumed by keygen (ring/sampler.rng_streams)
KEYGEN_STREAMS = 4


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class LmssScheme:
    """Runtime scheme state (reference LMSS struct, scheme.jl:168-179)."""

    brk_hat: jnp.ndarray  # [n, k+1, l, k+1, npr, N]
    brk_shoup: jnp.ndarray
    mono_hat: jnp.ndarray  # [2N, npr, N] NTT(X^a - 1)
    mono_shoup: jnp.ndarray
    ksk_b: jnp.ndarray  # [NLIMB, (k*N - n) * f * D/2]
    ksk_a: jnp.ndarray  # [NLIMB, (k*N - n) * f * D/2, n]


def _ctx(params: BlockParams) -> RingCtx:
    return make_ring_ctx(params.big_n, params.torus_bits, params.nprimes)


def monomial_table(ctx: RingCtx):
    """NTT images of X^a - 1 for a in [0, 2N) (scheme.jl:121-146).

    Index a directly (the reference's 1-based table stores a-1 and puts the
    zero polynomial for a = 0 at slot 2N).
    """
    n = ctx.n
    eye = np.zeros((2 * n, n), dtype=np.int64)
    for a in range(2 * n):
        if a == 0:
            continue
        if a < n:
            eye[a, a] = 1
        else:
            eye[a, a - n] = -1
        eye[a, 0] -= 1
    polys = jnp.asarray(eye.astype(np.uint64).astype(np.dtype(ctx.dtype)))
    hat = fwd_ntt(lift(polys, ctx.crt), ctx.plan)
    return hat, shoup_pair(hat, ctx.plan)


@functools.partial(jax.jit, static_argnames=("params",))
def setup(rng, params: BlockParams):
    """Keygen: (lwe_key, ring_key, scheme) -- scheme.jl:190-205.

    ksk covers only ring-key coefficients beyond n (the first n ARE the
    LWE key; keygen.jl:43-51).
    """
    ctx = _ctx(params)
    k_lwe, k_ring, k_brk, k_ksk = rng_streams(rng, KEYGEN_STREAMS)
    lwe_key = block_binary_lwe_key(k_lwe, params.d, params.ell, jnp.uint32)
    ring_key = partial_ring_key(k_ring, params.k, lwe_key, ctx)

    rngs = jax.random.split(k_brk, params.n)
    brk = jax.vmap(
        lambda r, bit: rgsw_encrypt(
            r, bit, ring_key, params.beta, params.l_gsw, params.log_b_gsw, ctx
        )
    )(rngs, lwe_key.key)
    brk_hat, brk_shoup = rgsw_to_hat(brk, ctx)

    mono_hat, mono_shoup = monomial_table(ctx)

    tail = ring_key.key.reshape(-1)[params.n :]
    ksk_b, ksk_a = build_ksk(k_ksk, tail, lwe_key, params.f, params.log_d, params.alpha)

    return lwe_key, ring_key, LmssScheme(
        brk_hat=brk_hat,
        brk_shoup=brk_shoup,
        mono_hat=mono_hat,
        mono_shoup=mono_shoup,
        ksk_b=ksk_b,
        ksk_a=ksk_a,
    )


def blind_rotate(acc, tildea, scheme: LmssScheme, params: BlockParams, ctx: RingCtx, pallas_ntt: bool = False, interpret: bool = False):
    """d block steps, each with one decomposition and ell external products
    accumulated in the evaluation domain (bootstrapping.jl:129-164)."""
    ell = params.ell
    n, d = params.n, params.d
    brk_hat = scheme.brk_hat.reshape(d, ell, *scheme.brk_hat.shape[1:])
    brk_shoup = scheme.brk_shoup.reshape(d, ell, *scheme.brk_shoup.shape[1:])
    ta_blocks = tildea.T.reshape(d, ell, -1)  # [d, ell, G]
    p = ctx.plan.primes[:, None]
    from .kms import _ntt_fns

    fwd, inv = _ntt_fns(pallas_ntt, interpret)

    def step(acc, xs):
        brk_h, brk_s, ta = xs  # [ell, ...], ta [ell, G]
        dhat = rlwe_decomp_hat(acc, params.l_gsw, params.log_b_gsw, ctx, fwd)
        # per member: external product then monomial weight, summed mod p
        def member(carry, mxs):
            b_h, b_s, t = mxs
            ehat = external_product_hat(dhat, b_h, b_s, ctx)  # [G, k+1, npr, N]
            mono = scheme.mono_hat[t]  # [G, npr, N]
            mono_s = scheme.mono_shoup[t]
            weighted = shoup_mul(mono[:, None], mono_s[:, None], ehat, p)
            return addmod(carry, weighted, p), None

        zero = jnp.zeros(
            (acc.shape[0], acc.shape[1], ctx.nprimes, ctx.n), dtype=jnp.uint32
        )
        tacc2, _ = jax.lax.scan(member, zero, (brk_h, brk_s, ta))
        e = from_crt(inv(tacc2, ctx.plan), ctx.crt, ctx.dtype)
        return acc + e, None

    acc, _ = jax.lax.scan(step, acc, (brk_hat, brk_shoup, ta_blocks))
    return acc


@functools.partial(jax.jit, static_argnames=("params", "pallas_ntt", "interpret"))
def bootstrap(ct: Lwe, scheme: LmssScheme, params: BlockParams, pallas_ntt: bool = False, interpret: bool = False) -> Lwe:
    """Gate bootstrap (bootstrapping.jl:4-27 with LMSS dispatch)."""
    ctx = _ctx(params)
    tildeb, tildea = mod_switch_2n(ct, params.big_n)
    acc = initial_acc(tildeb, params.big_n, params.k, ctx.dtype)
    acc = blind_rotate(acc, tildea, scheme, params, ctx, pallas_ntt, interpret)
    return keyswitch_partial(
        acc, params.n, scheme.ksk_b, scheme.ksk_a, params.f, params.log_d
    )
