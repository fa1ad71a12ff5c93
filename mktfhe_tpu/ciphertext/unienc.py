"""CCS19 uni-encryption against a common reference string (CRS).

Counterpart of /root/reference/src/ciphertext/unienc.jl.  A uni-encryption
of m under party key s is:
    d_j = r * a_j + m * g_j + e   (masked-poly vector under the CRS a)
    f   = RLEV encryption of the ephemeral ternary key r under s
and a party's public key is b_j = -s * a_j + e (gen_b, unienc.jl:77-90).
The ring here always has k = 1 (unienc.jl usage in the schemes).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ring.context import RingCtx
from ..ring.ntt import fwd_ntt, inv_ntt, pointwise_shoup
from ..ring.sampler import gaussian_torus, uniform_torus
from ..ring.torus import from_crt, lift
from .keys import RingKey, ternary_ring_key
from .rlwe import gadget_gvec, rlev_encrypt


class UniEnc(NamedTuple):
    d: jnp.ndarray  # [l, N] torus
    f: jnp.ndarray  # [l, 2, N] torus (RLEV over a k=1 ring)


def sample_crs(rng, l_uni: int, ctx: RingCtx):
    """Uniform CRS polynomials (scheme.jl:409-410)."""
    return uniform_torus(rng, (l_uni, ctx.n), ctx.dtype)


def _mul_ring_key(polys, key: RingKey, ctx: RingCtx):
    """Exact s * a_j for a stack of polys [l, N] and a k=1 ring key."""
    ahat = fwd_ntt(lift(polys, ctx.crt), ctx.plan)
    prod = pointwise_shoup(key.hat[0], key.hat_shoup[0], ahat, ctx.plan)
    return from_crt(inv_ntt(prod, ctx.plan), ctx.crt, ctx.dtype)


def gen_b(rng, crs, key: RingKey, sigma: float, ctx: RingCtx):
    """Party public key b_j = -s a_j + e (unienc.jl:77-90); [l, N]."""
    e = gaussian_torus(rng, crs.shape, sigma, ctx.dtype)
    return e - _mul_ring_key(crs, key, ctx)


def unienc_encrypt(rng, msg, crs, key: RingKey, sigma: float, l: int, log_b: int, ctx: RingCtx) -> UniEnc:
    """Uni-encrypt a scalar or poly message (unienc.jl:36-75)."""
    k_r, k_d, k_f = jax.random.split(rng, 3)
    r = ternary_ring_key(k_r, 1, ctx)
    gvec = gadget_gvec(l, log_b, ctx.dtype)
    msg = jnp.asarray(msg, dtype=ctx.dtype)
    if msg.ndim == 0:
        msgpoly = jnp.zeros((l, ctx.n), ctx.dtype).at[:, 0].set(gvec * msg)
    else:
        msgpoly = gvec[:, None] * msg[None, :]
    e = gaussian_torus(k_d, (l, ctx.n), sigma, ctx.dtype)
    d = _mul_ring_key(crs, r, ctx) + msgpoly + e
    f = rlev_encrypt(k_f, r.key[0], 0, key, sigma, l, log_b, ctx)
    return UniEnc(d=d, f=f)
