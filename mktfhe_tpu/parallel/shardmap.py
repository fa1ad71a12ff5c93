"""Explicit shard_map multi-key bootstrap: party-sharded phase 1.

Alternative to parallel/mesh.py's partitioner-driven path, with the
communication pattern written out explicitly (SURVEY.md section 5,
"distributed communication backend"):

  * phase 1: `shard_map` over the `party` mesh axis -- zero communication
    (the reference's `@spawn` per party, bootstrapping.jl:376-378);
  * phase boundary: one all_gather of the per-party lev keys over ICI
    (l_lev * 2 * nprimes * N uint32 words per party per gate);
  * phase 2 + key switch: replicated (the sequential merge is the scaling
    bottleneck by construction; each device computes the same merge).

Bit-identical to the single-device path (tests/test_parallel.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ciphertext.lwe import Lwe
from ..ring.context import make_ring_ctx
from ..schemes import kms
from ..schemes.common import initial_acc, mod_switch_2n
from ..schemes.params import KmsBlockParams


@functools.partial(jax.jit, static_argnames=("params", "mesh"))
def kms_bootstrap_shardmap(ct: Lwe, scheme: kms.KmsScheme, params, mesh: Mesh) -> Lwe:
    """KMS gate bootstrap with shard_map phase 1 over the party axis.

    Requires mesh axis 'party' with size dividing k; per-party brk shards
    resident per device group (see mesh.shard_scheme).
    """
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)
    k = params.k
    tildeb, tildea = mod_switch_2n(ct, params.big_n)
    g = tildea.shape[0]
    tild = jnp.moveaxis(tildea.reshape(g, k, params.n), 1, 0)  # [k, G, n]
    is_block = isinstance(params, KmsBlockParams)

    def phase1_shard(ta_shard, brk_h_shard, brk_s_shard):
        # ta_shard: [k/P, G, n]; one local python loop over resident parties
        outs = []
        for i in range(ta_shard.shape[0]):
            if is_block:
                lk = kms.phase1_block(
                    ta_shard[i], brk_h_shard[i], brk_s_shard[i],
                    params.l_lev, scheme, params, ctx,
                )
            else:
                lk = kms.phase1(
                    ta_shard[i], brk_h_shard[i], brk_s_shard[i],
                    params.l_lev, params, ctx,
                )
            outs.append(lk)
        local = jnp.stack(outs)  # [k/P, G, rows, 2, npr, N]
        # phase boundary: gather every party's lev key onto every device
        return jax.lax.all_gather(local, "party", axis=0, tiled=True)

    levkeys = jax.shard_map(
        phase1_shard,
        mesh=mesh,
        in_specs=(P("party"), P("party"), P("party")),
        out_specs=P(),
        check_vma=False,
    )(tild, scheme.brk_hat, scheme.brk_shoup)

    acc = initial_acc(tildeb, params.big_n, k, ctx.dtype)
    for p1 in range(1, k + 1):
        iter_rows = 1 if p1 == 1 else params.l_lev
        acc = kms._phase2_party(
            acc, levkeys[p1 - 1][:, :iter_rows], p1, scheme, params, ctx
        )
    return kms._keyswitch(acc, scheme, params)
