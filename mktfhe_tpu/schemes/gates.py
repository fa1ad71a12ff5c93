"""Boolean gate API and the binary message layer.

Counterparts: gate affine combinations /root/reference/src/tfhe/gate.jl,
message encode/encrypt/decrypt /root/reference/src/tfhe/scheme.jl:352-410.

Encoding: mu = (2m - 1) * 2^(T-3), i.e. +-1/8 on the torus.  Gates compute
an affine combination then bootstrap; batched over the leading gate axis,
optionally with a per-gate opcode (the affine part is branchless table
arithmetic, so heterogeneous gate batches cost the same as homogeneous
ones -- the reference evaluates one gate at a time).
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ciphertext.keys import LweKey
from ..ciphertext.lwe import Lwe, lwe_sample
from ..ring.torus import bits_of, divbits

# opcode -> (constant in eighths of the torus, sign, scale)
GATE_TABLE = {
    "NAND": (1, -1, 1),
    "AND": (7, 1, 1),
    "OR": (1, 1, 1),
    "XOR": (2, 1, 2),
    "XNOR": (6, -1, 2),
    "NOR": (7, -1, 1),
}
GATE_IDS = {name: i for i, name in enumerate(GATE_TABLE)}
_CONSTS = jnp.array([v[0] for v in GATE_TABLE.values()], dtype=jnp.int32)
_SIGNS = jnp.array([v[1] * v[2] for v in GATE_TABLE.values()], dtype=jnp.int32)

CLEAR_OPS = {
    "NAND": lambda x, y: not (x and y),
    "AND": lambda x, y: x and y,
    "OR": lambda x, y: x or y,
    "XOR": lambda x, y: x != y,
    "XNOR": lambda x, y: x == y,
    "NOR": lambda x, y: not (x or y),
}


def encode(m, dtype):
    """m in {0,1} -> mu = (2m-1) * 2^(T-3) (scheme.jl:356-357)."""
    t = bits_of(dtype)
    m = jnp.asarray(m)
    mu = 2 * m.astype(jnp.int32) - 1
    return (mu.astype(jnp.int64) << (t - 3)).astype(dtype)


def lwe_encrypt_bit(rng, m, key: LweKey, alpha: float, shape=()):
    """Single-key encryption of message bits (scheme.jl:352-368)."""
    ct = lwe_sample(rng, key, alpha, shape)
    return Lwe(b=ct.b + encode(m, ct.b.dtype), a=ct.a)


def lwe_ith_encrypt_bit(rng, m, i: int, key: LweKey, alpha: float, k: int, shape=()):
    """Party i's encryption in a k-party system: its mask occupies segment i
    of the concatenated k*n mask (scheme.jl:370-386)."""
    ct = lwe_sample(rng, key, alpha, shape)
    n = key.n
    a = jnp.zeros((*ct.a.shape[:-1], k * n), dtype=ct.a.dtype)
    a = a.at[..., i * n : (i + 1) * n].set(ct.a)
    return Lwe(b=ct.b + encode(m, ct.b.dtype), a=a)


def lwe_decrypt_bit(ct: Lwe, key: LweKey):
    """Single-key decrypt: round(phase * 8) == 1 (scheme.jl:388-389)."""
    t = bits_of(ct.b.dtype)
    ph = ct.b + jnp.sum(ct.a * key.key, axis=-1, dtype=ct.a.dtype)
    return divbits(ph, t - 3) == 1


def lwe_decrypt_bit_mk(ct: Lwe, keys: list[LweKey]):
    """Multi-key decrypt: sum of per-party partial phases < q/2
    (scheme.jl:391-407)."""
    t = bits_of(ct.b.dtype)
    n = keys[0].n
    ph = ct.b
    for i, key in enumerate(keys):
        seg = ct.a[..., i * n : (i + 1) * n]
        ph = ph + jnp.sum(seg * key.key, axis=-1, dtype=seg.dtype)
    one = jnp.array(1, dtype=ph.dtype)
    return ph < (one << (t - 1))


def gate_affine(op_id, ct1: Lwe, ct2: Lwe) -> Lwe:
    """Affine pre-bootstrap combination (gate.jl:1-53), branchless over a
    per-gate opcode array (op_id: int or [G] int32 indexing GATE_IDS)."""
    dtype = ct1.b.dtype
    t = bits_of(dtype)
    op_id = jnp.asarray(op_id, dtype=jnp.int32)
    c = _CONSTS[op_id].astype(jnp.int64) << (t - 3)
    s = _SIGNS[op_id]
    c = c.astype(dtype)
    s64 = s.astype(jnp.int64).astype(dtype)
    b = c + s64 * (ct1.b + ct2.b)
    a = s64[..., None] * (ct1.a + ct2.a)
    return Lwe(b=b, a=a)


def not_gate(ct: Lwe) -> Lwe:
    """NOT: negate in place, no bootstrap (gate.jl:55-58)."""
    return Lwe(b=-ct.b, a=-ct.a)


def gate(op, ct1: Lwe, ct2: Lwe, bootstrap_fn) -> Lwe:
    """Evaluate a (batched) boolean gate: affine combine + bootstrap.

    op: gate name, opcode int, or per-gate [G] opcode array.
    bootstrap_fn: the scheme's bootstrap closure (e.g. cggi.bootstrap
    partially applied with scheme and params).
    """
    if isinstance(op, str):
        op = GATE_IDS[op]
    return bootstrap_fn(gate_affine(op, ct1, ct2))
