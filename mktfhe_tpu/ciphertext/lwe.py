"""LWE ciphertexts over the discretized torus.

Counterpart of /root/reference/src/ciphertext/lwe.jl:1-59.  A ciphertext is
a pytree {b: [...], a: [..., dim]} batched over arbitrary leading axes;
homomorphic add/sub are plain wrapping array ops.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ring.sampler import gaussian_torus, uniform_torus
from .keys import LweKey


class Lwe(NamedTuple):
    b: jnp.ndarray  # [...]
    a: jnp.ndarray  # [..., dim]


def _wrap_sum(x, axis=-1):
    return jnp.sum(x, axis=axis, dtype=x.dtype)


def lwe_sample(rng, key: LweKey, sigma: float, shape=()) -> Lwe:
    """Fresh encryption of zero: b = -<a, s> + e (lwe.jl:11-16)."""
    dtype = key.key.dtype
    k_a, k_e = jax.random.split(rng)
    a = uniform_torus(k_a, (*shape, key.n), dtype)
    e = gaussian_torus(k_e, shape, sigma, dtype)
    b = e - _wrap_sum(a * key.key)
    return Lwe(b=b, a=a)


def lwe_encrypt(rng, m, key: LweKey, sigma: float, shape=()) -> Lwe:
    """b += m (lwe.jl:18-22); m broadcastable to `shape`."""
    ct = lwe_sample(rng, key, sigma, shape)
    return Lwe(b=ct.b + jnp.asarray(m, dtype=ct.b.dtype), a=ct.a)


def lwe_ith_encrypt(rng, m, i: int, key: LweKey, sigma: float, shape=()) -> Lwe:
    """a[i] += m (lwe.jl:24-28)."""
    ct = lwe_sample(rng, key, sigma, shape)
    return Lwe(b=ct.b, a=ct.a.at[..., i].add(jnp.asarray(m, dtype=ct.a.dtype)))


def phase(ct: Lwe, key: LweKey):
    """b + <a, s> (lwe.jl:30-32)."""
    return ct.b + _wrap_sum(ct.a * key.key)


def lwe_add(x: Lwe, y: Lwe) -> Lwe:
    return Lwe(b=x.b + y.b, a=x.a + y.a)


def lwe_sub(x: Lwe, y: Lwe) -> Lwe:
    return Lwe(b=x.b - y.b, a=x.a - y.a)


def lwe_neg(x: Lwe) -> Lwe:
    return Lwe(b=-x.b, a=-x.a)
