"""Secret keys: LWE vectors and ring (RLWE) keys with NTT-domain mirrors.

Counterpart of /root/reference/src/ciphertext/key.jl.  A ring key carries
its coefficients plus the forward-NTT image (with Shoup companions), the
analogue of the reference's pre-FFT'd `tkey` (key.jl:24-25) -- ring-key
multiplications in keygen always have the key as the precomputed operand.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..ring.context import RingCtx
from ..ring.ntt import fwd_ntt, shoup_pair
from ..ring.sampler import block_binary, uniform_binary, uniform_ternary
from ..ring.torus import lift


class LweKey(NamedTuple):
    """Binary/ternary/block-binary LWE secret (key.jl:1-19)."""

    key: jnp.ndarray  # [n] torus dtype, entries 0/1 (or wrapped -1)

    @property
    def n(self) -> int:
        return self.key.shape[-1]


class RingKey(NamedTuple):
    """RLWE secret: k polynomials + NTT-domain mirror (key.jl:21-50)."""

    key: jnp.ndarray  # [k, N] torus dtype
    hat: jnp.ndarray  # [k, npr, N] uint32
    hat_shoup: jnp.ndarray  # [k, npr, N] uint32

    @property
    def k(self) -> int:
        return self.key.shape[0]

    @property
    def n(self) -> int:
        return self.key.shape[-1]


def _mk_ringkey(coeffs, ctx: RingCtx) -> RingKey:
    hat = fwd_ntt(lift(coeffs, ctx.crt), ctx.plan)
    return RingKey(key=coeffs, hat=hat, hat_shoup=shoup_pair(hat, ctx.plan))


def binary_lwe_key(rng, n: int, dtype) -> LweKey:
    return LweKey(key=uniform_binary(rng, (n,), dtype))


def ternary_lwe_key(rng, n: int, dtype) -> LweKey:
    return LweKey(key=uniform_ternary(rng, (n,), dtype))


def block_binary_lwe_key(rng, d: int, ell: int, dtype) -> LweKey:
    return LweKey(key=block_binary(rng, d, ell, dtype))


def binary_ring_key(rng, k: int, ctx: RingCtx) -> RingKey:
    return _mk_ringkey(uniform_binary(rng, (k, ctx.n), ctx.dtype), ctx)


def ternary_ring_key(rng, k: int, ctx: RingCtx) -> RingKey:
    return _mk_ringkey(uniform_ternary(rng, (k, ctx.n), ctx.dtype), ctx)


def partial_ring_key(rng, k: int, lwe_key: LweKey, ctx: RingCtx) -> RingKey:
    """Ring key whose first n coefficients are the LWE key bits.

    The LMSS trick enabling a free partial key-switch (key.jl:52-88); the
    dtype-widening variant (key.jl:71-88, used by KMS-block where the LWE
    key is uint32 but the ring is uint64) is subsumed by casting here.
    """
    n = lwe_key.n
    total = k * ctx.n
    assert n <= total
    fill = uniform_binary(rng, (total - n,), ctx.dtype)
    flat = jnp.concatenate([lwe_key.key.astype(ctx.dtype), fill])
    return _mk_ringkey(flat.reshape(k, ctx.n), ctx)
