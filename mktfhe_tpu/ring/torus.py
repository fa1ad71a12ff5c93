"""Torus scalar operations and CRT lifting/reconstruction.

Counterpart of /root/reference/src/ring/arithmetic.jl.  The torus Z_q
(q = 2^32 or 2^64) is represented by wrapping unsigned integers, exactly as
in the reference (`native`, arithmetic.jl:1-17).  The float->torus fold is
unnecessary here because nothing ever leaves exact integer arithmetic: the
CRT/NTT pipeline replaces both the Float64 fast path and the Float64x2
keygen path of the reference.

`divbits` (round-to-nearest division by 2^bit, arithmetic.jl:23-27) is the
modulus-switch primitive used by bootstrapping and gadget decomposition.

CRT lifting maps torus values to residues mod the NTT primes.  Keys and
accumulators are lifted *balanced* (representative in [-q/2, q/2)) so that
integer convolutions stay inside the CRT range; congruence mod q is
preserved either way, so reduction mod q after reconstruction is exact.
Reconstruction is Garner's mixed-radix algorithm, generalized to any prime
count (2 primes for uint32 schemes, 3-4 for uint64 KMS schemes depending on
the contraction bound; see schemes/params.py).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .modring import (
    PRIMES,
    U32,
    addmod,
    reduce_u32,
    shoup,
    shoup_mul,
    submod,
)

U64 = jnp.uint64


def bits_of(dtype) -> int:
    return jnp.dtype(dtype).itemsize * 8


def divbits(a, bit: int):
    """Round-to-nearest shift: round(a / 2^bit), wrapped in T-bit arithmetic.

    Mirrors /root/reference/src/ring/arithmetic.jl:23-27.
    """
    t = bits_of(a.dtype)
    if bit == 0:
        return a
    assert 0 < bit < t
    carry = (a << (t - bit)) >> (t - 1)
    return (a >> bit) + carry


class CrtPlan(NamedTuple):
    """Host-precomputed constants for torus <-> CRT conversion."""

    nprimes: int
    primes: jnp.ndarray  # [npr] uint32
    # 2^32 mod p and 2^64 mod p (with Shoup companions) for lifting.
    c32: jnp.ndarray
    c32_shoup: jnp.ndarray
    c64: jnp.ndarray
    c64_shoup: jnp.ndarray
    # Garner: inv(prod(p_0..p_{j-1})) handled iteratively via
    # inv_pj[i][j] = inv(p_j) mod p_i (with Shoup), for j < i.
    inv_pj: tuple  # tuple of tuples of (w, w_shoup) ints
    prod_mod32: int  # prod(primes) mod 2^32
    prod_mod64: int  # prod(primes) mod 2^64


@functools.lru_cache(maxsize=None)
def make_crt_plan(nprimes: int) -> CrtPlan:
    ps = PRIMES[:nprimes]
    c32 = [(1 << 32) % p for p in ps]
    c64 = [(1 << 64) % p for p in ps]
    inv_pj = tuple(
        tuple(
            (pow(ps[j], -1, ps[i]), shoup(pow(ps[j], -1, ps[i]), ps[i]))
            for j in range(i)
        )
        for i in range(nprimes)
    )
    prod = 1
    for p in ps:
        prod *= p
    # host numpy arrays: see the note in ntt.make_plan about lru_cache + jit
    return CrtPlan(
        nprimes=nprimes,
        primes=np.array(ps, dtype=np.uint32),
        c32=np.array(c32, dtype=np.uint32),
        c32_shoup=np.array([shoup(c, p) for c, p in zip(c32, ps)], dtype=np.uint32),
        c64=np.array(c64, dtype=np.uint32),
        c64_shoup=np.array([shoup(c, p) for c, p in zip(c64, ps)], dtype=np.uint32),
        inv_pj=inv_pj,
        prod_mod32=prod % (1 << 32),
        prod_mod64=prod % (1 << 64),
    )


def _bview(x):
    """Broadcast helper: append a prime axis before the last data axis."""
    return x[..., None, :]


def lift_u32(a, plan: CrtPlan, balanced: bool = True):
    """uint32 torus [..., N] -> residues [..., npr, N] in [0, p_i)."""
    p = plan.primes[:, None]
    r = reduce_u32(_bview(a), p)
    if balanced:
        r = jnp.where(
            _bview(a) >= U32(1 << 31),
            submod(r, plan.c32[:, None], p),
            r,
        )
    return r


def lift_u64(a, plan: CrtPlan, balanced: bool = True):
    """uint64 torus [..., N] -> residues [..., npr, N] in [0, p_i)."""
    p = plan.primes[:, None]
    lo = (a & U64(0xFFFFFFFF)).astype(U32)
    hi = (a >> 32).astype(U32)
    r = addmod(
        reduce_u32(_bview(lo), p),
        shoup_mul(
            plan.c32[:, None], plan.c32_shoup[:, None], reduce_u32(_bview(hi), p), p
        ),
        p,
    )
    if balanced:
        r = jnp.where(
            _bview(hi) >= U32(1 << 31),
            submod(r, plan.c64[:, None], p),
            r,
        )
    return r


def lift(a, plan: CrtPlan, balanced: bool = True):
    if a.dtype == jnp.uint32:
        return lift_u32(a, plan, balanced)
    assert a.dtype == jnp.uint64
    return lift_u64(a, plan, balanced)


def lift_signed_small(d, plan: CrtPlan):
    """Signed int32 digits (|d| < 2^29) -> residues [..., npr, N]."""
    p = plan.primes[:, None].astype(jnp.int32)
    dv = _bview(d)
    return jnp.where(dv < 0, dv + p, dv).astype(U32)


def _garner_digits(r, plan: CrtPlan):
    """Mixed-radix digits t_i from residues r [..., npr, N]."""
    m = plan.nprimes
    ps = [int(p) for p in np.asarray(plan.primes)]
    t = [r[..., 0, :]]
    for i in range(1, m):
        u = r[..., i, :]
        for j in range(i):
            w, w_sh = plan.inv_pj[i][j]
            u = shoup_mul(
                U32(w), U32(w_sh), submod(u, reduce_u32(t[j], ps[i]), ps[i]), ps[i]
            )
        t.append(u)
    return t, ps


def from_crt_u32(r, plan: CrtPlan):
    """Residues [..., npr, N] -> balanced representative wrapped to uint32.

    x = t_0 + p_0 (t_1 + p_1 (...)), evaluated with wrapping uint32 Horner;
    the top mixed-radix digit's sign selects the balanced representative.
    Exact when |true integer| < prod(primes)/2 (the per-scheme bounds).
    """
    t, ps = _garner_digits(r, plan)
    m = plan.nprimes
    x = t[-1]
    for i in range(m - 2, -1, -1):
        x = t[i] + U32(ps[i] % (1 << 32)) * x
    neg = t[-1] >= U32(ps[-1] // 2)
    return jnp.where(neg, x - U32(plan.prod_mod32), x)


def from_crt_u64(r, plan: CrtPlan):
    """Residues [..., npr, N] -> balanced representative wrapped to uint64."""
    t, ps = _garner_digits(r, plan)
    m = plan.nprimes
    x = t[-1].astype(U64)
    for i in range(m - 2, -1, -1):
        x = t[i].astype(U64) + U64(ps[i]) * x
    neg = t[-1] >= U32(ps[-1] // 2)
    return jnp.where(neg, x - U64(plan.prod_mod64), x)


def from_crt(r, plan: CrtPlan, dtype):
    if jnp.dtype(dtype) == jnp.uint32:
        return from_crt_u32(r, plan)
    assert jnp.dtype(dtype) == jnp.uint64
    return from_crt_u64(r, plan)


def negacyclic_roll(v, shift):
    """v(X) * X^shift in Z_q[X]/(X^N+1); shift is a traced scalar in [0, 2N).

    Replaces the reference's 2N-entry precomputed monomial FFT table
    (/root/reference/src/tfhe/scheme.jl:121-146) with a coefficient-domain
    rotation: extend v to [v, -v] (length 2N) and roll.  shift == 0 is the
    identity, which makes `roll(v, s) - v` vanish exactly when s == 0 --
    the branchless version of the `tildea[idx] > 0` skip at
    /root/reference/src/tfhe/bootstrapping.jl:48.
    """
    ext = jnp.concatenate([v, -v], axis=-1)
    n = v.shape[-1]
    return jnp.roll(ext, shift, axis=-1)[..., :n]
