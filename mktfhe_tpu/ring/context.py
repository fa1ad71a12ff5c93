"""Ring context: bundles ring dimension, torus dtype, NTT and CRT plans."""

from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax.numpy as jnp

from .modring import PRIMES, nprimes_for_bits
from .ntt import NttPlan, make_plan
from .torus import CrtPlan, bits_of, make_crt_plan


class RingCtx(NamedTuple):
    """Everything needed for exact arithmetic in Z_q[X]/(X^N+1).

    Plays the role of the reference's FFTransformer
    (/root/reference/src/ring/fft.jl:18-45), except a single context serves
    both keygen and bootstrapping: the NTT is exact, so the reference's
    split into a Float64x2 keygen transformer and a Float64 boot
    transformer (/root/reference/src/tfhe/scheme.jl:154-155) is unneeded.
    """

    n: int
    dtype: jnp.dtype
    plan: NttPlan
    crt: CrtPlan

    @property
    def torus_bits(self) -> int:
        return bits_of(self.dtype)

    @property
    def nprimes(self) -> int:
        return self.plan.nprimes


@functools.lru_cache(maxsize=None)
def make_ring_ctx(n: int, torus_bits: int, nprimes: int | None = None) -> RingCtx:
    npr = nprimes if nprimes is not None else nprimes_for_bits(torus_bits)
    dtype = jnp.dtype(jnp.uint32 if torus_bits == 32 else jnp.uint64)
    return RingCtx(n=n, dtype=dtype, plan=make_plan(n, npr), crt=make_crt_plan(npr))


def nprimes_needed(torus_bits: int, n: int, terms) -> int:
    """Smallest CRT prime count whose range covers every contraction.

    terms: iterable of (halfB, nterms); the worst reconstructed integer has
    |value| <= halfB * 2^(torus_bits-1) * N * nterms and must stay below
    prod(primes)/2 for balanced Garner reconstruction to be exact.
    """
    worst = max(2 * half_b * (1 << (torus_bits - 1)) * n * nt for half_b, nt in terms)
    npr = nprimes_for_bits(torus_bits)
    while math.prod(PRIMES[:npr]) <= worst:
        npr += 1
        assert npr <= len(PRIMES), "contraction exceeds available CRT range"
    return npr
