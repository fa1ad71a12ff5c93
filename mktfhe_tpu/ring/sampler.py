"""Randomness for keys, masks, and noise, built on jax.random (threefry).

Counterpart of /root/reference/src/ring/sampler.jl (ChaCha20-based).  The
reference draws from a ChaCha20 CSPRNG; we thread explicit jax.random keys
so every keygen/encrypt call is deterministic given its key -- which is what
the test strategy needs (the reference has no replayable streams at all).
A hardened host-side CSPRNG seed source can be layered on top by seeding
from OS entropy.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .torus import bits_of


def rng_streams(rng, n: int):
    """n independent top-level sampling streams for a keygen.

    `rng` is either a single PRNG key (split n ways -- the deterministic
    test path) or a pre-seeded [n] key array from
    native/chacha.secure_streams, where each entry carries its own fresh
    64 bits of CSPRNG entropy (so a keygen consumes >= 256 bits of ChaCha
    output, matching sampler.jl:1-34's everything-from-ChaCha stance).
    """
    if getattr(rng, "ndim", 0) == 1:
        assert rng.shape[0] == n, f"expected {n} streams, got {rng.shape[0]}"
        return rng
    return jax.random.split(rng, n)


def uniform_torus(key, shape, dtype):
    """Uniform torus elements (uniform_random32/64, sampler.jl:30-34)."""
    if bits_of(dtype) == 32:
        return jax.random.bits(key, shape, dtype=jnp.uint32)
    k1, k2 = jax.random.split(key)
    lo = jax.random.bits(k1, shape, dtype=jnp.uint32).astype(jnp.uint64)
    hi = jax.random.bits(k2, shape, dtype=jnp.uint32).astype(jnp.uint64)
    return (hi << 32) | lo


def uniform_binary(key, shape, dtype):
    """{0, 1} secrets (sampler.jl:1-2)."""
    return jax.random.bernoulli(key, 0.5, shape).astype(dtype)


def uniform_ternary(key, shape, dtype):
    """{-1, 0, 1} secrets, stored wrapped in the torus dtype (sampler.jl:4-5)."""
    v = jax.random.randint(key, shape, -1, 2, dtype=jnp.int32)
    return v.astype(jnp.int64).astype(dtype) if bits_of(dtype) == 64 else v.astype(dtype)


def block_binary(key, d: int, ell: int, dtype):
    """Block-binary secret: d blocks of length ell, at most one 1 per block.

    Mirrors /root/reference/src/ring/sampler.jl:7-22: per block draw
    idx ~ Uniform{0..ell}; idx == 0 means an all-zero block.
    """
    idx = jax.random.randint(key, (d,), 0, ell + 1, dtype=jnp.int32)
    pos = jnp.arange(1, ell + 1, dtype=jnp.int32)[None, :]
    blocks = (idx[:, None] == pos).astype(dtype)
    return blocks.reshape(d * ell)


def gaussian_torus(key, shape, sigma: float, dtype):
    """Rounded gaussian noise, wrapped into the torus (sampler.jl:24-28).

    sigma is in absolute torus units (e.g. alpha = 2^17 on the 2^32 torus,
    /root/reference/src/tfhe/params.jl:2).  Values are < ~2^24 in practice
    so float32 sampling is exact after rounding.
    """
    e = jnp.round(jax.random.normal(key, shape, dtype=jnp.float32) * sigma)
    e_int = e.astype(jnp.int32)
    if bits_of(dtype) == 64:
        return e_int.astype(jnp.int64).astype(dtype)
    return e_int.astype(dtype)
