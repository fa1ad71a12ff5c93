"""RLWE / RLEV ciphertexts as stacked component arrays.

Counterpart of /root/reference/src/ciphertext/lwe.jl:61-260 and lev.jl.
An RLWE ciphertext is a single array [..., k+1, N] with component 0 = b and
components 1..k = the mask polynomials (the reference's separate b/a object
graph collapses into one axis, so decomposition/NTT batch over it).  An
RLEV is [..., l, k+1, N].  Evaluation-domain ("hat") images are uint32 CRT
residue arrays [..., k+1, nprimes, N].
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ring.context import RingCtx
from ..ring.modring import modsum
from ..ring.ntt import fwd_ntt, inv_ntt, pointwise_shoup
from ..ring.sampler import gaussian_torus, uniform_torus
from ..ring.torus import from_crt, lift
from .keys import RingKey


def rlwe_sample(rng, key: RingKey, sigma: float, ctx: RingCtx, shape=()):
    """Fresh RLWE encryption of zero: b = -sum_i s_i a_i + e (lwe.jl:78-93).

    Exact: the mask products go through the CRT-NTT, so there is no analogue
    of the reference's Float64x2 keygen transformer.
    Returns [..., k+1, N] (component 0 = b).
    """
    k = key.k
    k_a, k_e = jax.random.split(rng)
    a = uniform_torus(k_a, (*shape, k, ctx.n), ctx.dtype)
    ahat = fwd_ntt(lift(a, ctx.crt), ctx.plan)
    prod = pointwise_shoup(key.hat, key.hat_shoup, ahat, ctx.plan)
    acc = modsum(prod, -3, ctx.plan.primes[:, None])
    s_dot_a = from_crt(inv_ntt(acc, ctx.plan), ctx.crt, ctx.dtype)
    e = gaussian_torus(k_e, (*shape, ctx.n), sigma, ctx.dtype)
    b = e - s_dot_a
    return jnp.concatenate([b[..., None, :], a], axis=-2)


def rlwe_encrypt_msg(rng, msg, comp: int, key: RingKey, sigma: float, ctx: RingCtx, shape=()):
    """Encrypt by adding `msg` (poly [..., N] or scalar on coeff 0) to a component.

    comp = 0 adds to b (rlwe_encrypt, lwe.jl:95-99,107-111); comp = i adds
    to a_i (rlwe_ith_encrypt, lwe.jl:101-105,113-117).
    """
    ct = rlwe_sample(rng, key, sigma, ctx, shape)
    msg = jnp.asarray(msg, dtype=ctx.dtype)
    if msg.ndim == 0 or msg.shape[-1] != ctx.n:
        return ct.at[..., comp, 0].add(msg)
    return ct.at[..., comp, :].add(msg)


def rlwe_phase(ct, key: RingKey, ctx: RingCtx):
    """b + sum_i s_i a_i (lwe.jl:119-130); ct [..., k+1, N] -> [..., N]."""
    ahat = fwd_ntt(lift(ct[..., 1:, :], ctx.crt), ctx.plan)
    prod = pointwise_shoup(key.hat, key.hat_shoup, ahat, ctx.plan)
    acc = modsum(prod, -3, ctx.plan.primes[:, None])
    s_dot_a = from_crt(inv_ntt(acc, ctx.plan), ctx.crt, ctx.dtype)
    return ct[..., 0, :] + s_dot_a


def gadget_gvec(l: int, log_b: int, dtype):
    """g_j = 2^(T - (j+1) logB), j = 0..l-1 (lev.jl:12-19, 1-based there)."""
    t = jnp.dtype(dtype).itemsize * 8
    one = jnp.ones((), dtype=dtype)
    return jnp.stack([one << (t - (j + 1) * log_b) for j in range(l)])


def rlev_encrypt(rng, msg, comp: int, key: RingKey, sigma: float, l: int, log_b: int, ctx: RingCtx):
    """RLEV: stack of l RLWE rows encrypting g_j * msg (lev.jl:88-108).

    msg: scalar or poly [N].  Returns [l, k+1, N].
    """
    gvec = gadget_gvec(l, log_b, ctx.dtype)
    msg = jnp.asarray(msg, dtype=ctx.dtype)
    scaled = gvec * msg if msg.ndim == 0 else gvec[:, None] * msg[None, :]
    rngs = jax.random.split(rng, l)
    return jax.vmap(
        lambda r, m: rlwe_encrypt_msg(r, m, comp, key, sigma, ctx)
    )(rngs, scaled)
