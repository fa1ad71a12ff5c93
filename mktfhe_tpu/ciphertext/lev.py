"""LEV / GSW over plain LWE (non-ring) -- gadget stacks of LWE ciphertexts.

Counterpart of /root/reference/src/ciphertext/lev.jl:22-75 and
gsw.jl:112-162.  The schemes' key-switching keys are LEV stacks in the
reference (keygen.jl:17-23); in this framework they are folded into int8
matmul operands (schemes/common.py:build_ksk), so these types exist for API
parity and for protocol code that wants explicit leveled LWE objects.

The reference's homomorphic GSW add/sub are dead code with field-name typos
(gsw.jl:132,139,152 reference a nonexistent `x.basket` and would throw);
here they are plain wrapping array adds and work.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from .keys import LweKey
from .lwe import lwe_encrypt, lwe_ith_encrypt
from .rlwe import gadget_gvec


class Lev(NamedTuple):
    """l LWE rows encrypting g_j * m (lev.jl:22-28): b [..., l], a [..., l, n]."""

    b: jnp.ndarray
    a: jnp.ndarray


class Gsw(NamedTuple):
    """LEV of the b-row plus k LEVs of the a-rows (gsw.jl:112-120):
    b [..., k+1, l], a [..., k+1, l, n]; index 0 = basketb."""

    b: jnp.ndarray
    a: jnp.ndarray


def lev_encrypt(rng, m, key: LweKey, sigma: float, l: int, log_b: int) -> Lev:
    """lev.jl:31-37; m scalar or [...] batch."""
    gvec = gadget_gvec(l, log_b, key.key.dtype)
    msgs = jnp.asarray(m, dtype=key.key.dtype)[..., None] * gvec
    ct = lwe_encrypt(rng, msgs, key, sigma, shape=msgs.shape)
    return Lev(b=ct.b, a=ct.a)


def lev_ith_encrypt(rng, m, i: int, key: LweKey, sigma: float, l: int, log_b: int) -> Lev:
    """lev.jl:39-45."""
    gvec = gadget_gvec(l, log_b, key.key.dtype)
    msgs = jnp.asarray(m, dtype=key.key.dtype)[..., None] * gvec
    ct = lwe_ith_encrypt(rng, msgs, i, key, sigma, shape=msgs.shape)
    return Lev(b=ct.b, a=ct.a)


def gsw_encrypt(rng, m, key: LweKey, sigma: float, l: int, log_b: int) -> Gsw:
    """gsw.jl:122-129: basketb = LEV(m), basketa[i] = LEV with m g_j on a_i."""
    n = key.n
    rngs = jax.random.split(rng, n + 1)
    rows = [lev_encrypt(rngs[0], m, key, sigma, l, log_b)]
    for i in range(n):
        rows.append(lev_ith_encrypt(rngs[i + 1], m, i, key, sigma, l, log_b))
    return Gsw(
        b=jnp.stack([r.b for r in rows], axis=-2),
        a=jnp.stack([r.a for r in rows], axis=-3),
    )


def lev_add(x: Lev, y: Lev) -> Lev:
    return Lev(b=x.b + y.b, a=x.a + y.a)


def lev_sub(x: Lev, y: Lev) -> Lev:
    return Lev(b=x.b - y.b, a=x.a - y.a)


def gsw_add(x: Gsw, y: Gsw) -> Gsw:
    """Correct version of the reference's broken gsw.jl:131-142."""
    return Gsw(b=x.b + y.b, a=x.a + y.a)


def gsw_sub(x: Gsw, y: Gsw) -> Gsw:
    """Correct version of the reference's broken gsw.jl:144-155."""
    return Gsw(b=x.b - y.b, a=x.a - y.a)
