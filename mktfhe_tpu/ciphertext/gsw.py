"""(R)GSW ciphertexts and the external product.

Counterpart of /root/reference/src/ciphertext/gsw.jl:112-280.  An RGSW
encryption of m is the stacked array [cin, l, cout, N]:
row (ci, j) is an RLWE sample with m * g_j added to component ci
(ci = 0: the reference's `basketb`, gsw.jl:122-128; ci >= 1: `basketa`).
The external product contracts gadget digits of an accumulator against the
NTT-domain image of this stack -- the `muladdto!` hot loop of the
reference's blind rotation (bootstrapping.jl:62-68) becomes one batched
Shoup multiply + modular tree-sum.

The reference's homomorphic GSW add/sub are dead code with field-name typos
(gsw.jl:132,139,152 reference a nonexistent `x.basket`); here they are
plain array adds on the stack and actually work.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ring.context import RingCtx
from ..ring.modring import modsum
from ..ring.ntt import fwd_ntt, shoup_pair
from ..ring.torus import lift, lift_signed_small
from .decomp import balanced_decomp
from .keys import RingKey
from .rlwe import gadget_gvec, rlwe_sample


def rgsw_encrypt(rng, msg, key: RingKey, sigma: float, l: int, log_b: int, ctx: RingCtx):
    """RGSW(msg): [cin, l, cout, N] with cin = cout = k+1 (gsw.jl:174-184).

    msg: scalar torus value (a secret key bit) or poly [N].
    """
    kp1 = key.k + 1
    gvec = gadget_gvec(l, log_b, ctx.dtype)
    msg = jnp.asarray(msg, dtype=ctx.dtype)
    if msg.ndim == 0:
        msgpoly = jnp.zeros((l, ctx.n), ctx.dtype).at[:, 0].set(gvec * msg)
    else:
        msgpoly = gvec[:, None] * msg[None, :]
    sample = rlwe_sample(rng, key, sigma, ctx, shape=(kp1, l))
    onehot = jnp.eye(kp1, dtype=ctx.dtype)
    return sample + onehot[:, None, :, None] * msgpoly[None, :, None, :]


def rgsw_add(x, y):
    """Homomorphic RGSW add -- correct version of the reference's broken
    dead code (gsw.jl:186-197); stacks are arrays, so it's a wrapping add."""
    return x + y


def rgsw_sub(x, y):
    """Homomorphic RGSW sub (cf. broken gsw.jl:199-210)."""
    return x - y


def rgsw_to_hat(stack, ctx: RingCtx):
    """NTT-domain image + Shoup companion (the reference's TransRGSW/fft,
    gsw.jl:262-270); balanced lift keeps the CRT contraction bounds tight."""
    hat = fwd_ntt(lift(stack, ctx.crt), ctx.plan)
    return hat, shoup_pair(hat, ctx.plan)


def rlwe_decomp_hat(ct, l: int, log_b: int, ctx: RingCtx, fwd=fwd_ntt):
    """Gadget-decompose an RLWE ct [..., k+1, N] and NTT the digits.

    Returns [..., k+1, l, nprimes, N] residues -- the `decompto!` +
    `fftto!` prologue of every blind-rotation step
    (bootstrapping.jl:50-59).  `fwd` may be swapped for the Pallas
    natural-layout transform (bit-identical).
    """
    digits = balanced_decomp(ct, l, log_b)  # [..., k+1, N, l]
    digits = jnp.moveaxis(digits, -1, -2)  # [..., k+1, l, N]
    return fwd(lift_signed_small(digits, ctx.crt), ctx.plan)


def external_product_hat(dhat, hat, hat_shoup, ctx: RingCtx):
    """Contract decomposed digits against an RGSW stack, in the NTT domain.

    dhat: [..., cin, l, npr, N]; hat/hat_shoup: [..., cin, l, cout, npr, N]
    (leading axes broadcast).  Returns [..., cout, npr, N].
    Implements the accumulation at bootstrapping.jl:62-68 exactly.
    """
    from ..ring.modring import shoup_mul

    p = ctx.plan.primes[:, None]
    prods = shoup_mul(hat, hat_shoup, dhat[..., :, :, None, :, :], p)
    # merge (cin, l) into one contraction axis
    shp = prods.shape
    merged = prods.reshape(shp[:-5] + (shp[-5] * shp[-4],) + shp[-3:])
    return modsum(merged, -4, p)
