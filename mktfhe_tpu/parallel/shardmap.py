"""Explicit shard_map multi-key bootstrap: party-sharded phase 1,
gate-split phase 2.

Alternative to parallel/mesh.py's partitioner-driven path, with the
communication pattern written out explicitly (SURVEY.md section 5,
"distributed communication backend"):

  * phase 1: `shard_map` over the ('party', 'batch') mesh -- zero
    communication (the reference's `@spawn` per party,
    /root/reference/src/tfhe/bootstrapping.jl:376-378).  Engine-selectable:
    the reference jnp rotation, the batch-minor Pallas engine, or the MXU
    mx engine (pass the matching phase1_keys).
  * phase boundary: one all_gather of the per-party lev keys over the
    `party` axis of ICI -- l_lev * 2 * nprimes * N u32 words per party per
    local gate.
  * phase 2 + key switch: the sequential k-party merge is per-gate
    independent, so the devices along the party axis split the local gate
    batch between them (device p takes gates [p*Gs, (p+1)*Gs)) instead of
    replicating the merge; a second all_gather over `party` reassembles the
    batch.  Net: phase 2 runs on all party*batch devices at 1/(P*B) of the
    gates each.  Falls back to the replicated merge when the local batch
    does not divide by the party-axis size.

Bit-identical to the single-device path for every engine
(tests/test_parallel.py).
"""

from __future__ import annotations

import dataclasses
import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..ciphertext.lwe import Lwe
from ..ring.context import make_ring_ctx
from ..schemes import kms
from ..schemes.common import initial_acc, mod_switch_2n
from ..schemes.params import KmsBlockParams


def _phase1_fn(engine: str, params, ctx, pallas_ntt: bool, interpret: bool, scheme, p1k):
    """Per-party phase-1 callable (ta [G,n], brk_h, brk_s) -> lev key."""
    if engine == "bm":
        from ..kernels.batchminor import kms_phase1_bm

        return lambda ta, bh, bs: kms_phase1_bm(
            ta, bh, bs, p1k, params.l_lev, params, ctx, interpret
        )
    if engine == "mx":
        from ..kernels.fused_mx import kms_phase1_mx

        return lambda ta, bh, bs: kms_phase1_mx(
            ta, bh, bs, p1k, params.l_lev, params, ctx, interpret=interpret
        )
    if engine == "mx2":
        from ..kernels.fused_mx2 import kms_phase1_mx2

        return lambda ta, bh, bs: kms_phase1_mx2(
            ta, bh, bs, params.l_lev, params, ctx, interpret=interpret
        )
    if isinstance(params, KmsBlockParams):
        return lambda ta, bh, bs: kms.phase1_block(
            ta, bh, bs, params.l_lev, scheme, params, ctx, pallas_ntt, interpret
        )
    return lambda ta, bh, bs: kms.phase1(
        ta, bh, bs, params.l_lev, params, ctx, pallas_ntt, interpret
    )


@functools.partial(
    jax.jit, static_argnames=("params", "mesh", "pallas_ntt", "interpret", "engine")
)
def _bootstrap_shardmap(ct, scheme, params, mesh, pallas_ntt, interpret, engine, p1k, brk_h, brk_s):
    ctx = make_ring_ctx(params.big_n, params.ring_torus_bits, params.ring_nprimes)
    k = params.k
    n_party = mesh.shape["party"]
    n_batch = mesh.shape.get("batch", 1)  # party-only meshes are valid
    has_batch = "batch" in mesh.shape
    tildeb, tildea = mod_switch_2n(ct, params.big_n)
    g = tildea.shape[0]
    tild = jnp.moveaxis(tildea.reshape(g, k, params.n), 1, 0)  # [k, G, n]
    g_local = g // n_batch
    split_p2 = g_local % n_party == 0

    def body(tb_l, ta_l, brk_h_l, brk_s_l, scheme_r, p1k_r):
        p1_fn = _phase1_fn(engine, params, ctx, pallas_ntt, interpret, scheme_r, p1k_r)
        # ta_l: [k/P, Gl, n]; tb_l: [Gl]; python loop over resident parties
        local = jnp.stack(
            [p1_fn(ta_l[i], brk_h_l[i], brk_s_l[i]) for i in range(ta_l.shape[0])]
        )  # [k/P, Gl, l_lev, 2, npr, N]
        # phase boundary: every party's lev key to every device (ICI)
        lev = jax.lax.all_gather(local, "party", axis=0, tiled=True)  # [k, Gl, ...]

        if split_p2:
            # split the local gates across the party-axis devices
            gs = g_local // n_party
            pidx = jax.lax.axis_index("party")
            lev = jax.lax.dynamic_slice_in_dim(lev, pidx * gs, gs, axis=1)
            tb = jax.lax.dynamic_slice_in_dim(tb_l, pidx * gs, gs, axis=0)
        else:
            tb = tb_l

        acc = initial_acc(tb, params.big_n, k, ctx.dtype)
        for p1 in range(1, k + 1):
            iter_rows = 1 if p1 == 1 else params.l_lev
            acc = kms._phase2_party(
                acc, lev[p1 - 1][:, :iter_rows], p1, scheme_r, params, ctx,
                pallas_ntt=pallas_ntt, interpret=interpret,
            )
        out = kms._keyswitch(acc, scheme_r, params)
        if split_p2:
            # reassemble the gate batch from the party-axis split
            b = jax.lax.all_gather(out.b, "party", axis=0, tiled=True)
            a = jax.lax.all_gather(out.a, "party", axis=0, tiled=True)
            return b, a
        return out.b, out.a

    bax = "batch" if has_batch else None
    b, a = jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(P(bax), P("party", bax), P("party"), P("party"), P(), P()),
        out_specs=(P(bax), P(bax)),
        check_vma=False,
    )(tildeb, tild, brk_h, brk_s, scheme, p1k)
    return Lwe(b=b, a=a)


def kms_bootstrap_shardmap(ct: Lwe, scheme: kms.KmsScheme, params, mesh: Mesh, pallas_ntt: bool = False, interpret: bool = False, phase1_keys=None) -> Lwe:
    """KMS gate bootstrap with explicit shard_map over a (party, batch) mesh.

    Engine selection: phase1_keys=None runs the reference jnp phase 1
    (pallas_ntt routes its NTTs through the Pallas kernels); a BmKmsPhase1
    runs the batch-minor engine; an MxKmsPhase1 the MXU mx engine; an
    MxKmsKeys the whole-rotation mx2 engine.  Requires mesh axis 'party'
    with size dividing k; a 'batch' axis is optional.
    """
    engine = "ref"
    brk_h, brk_s = scheme.brk_hat, scheme.brk_shoup
    p1k = ()
    if phase1_keys is not None:
        from ..kernels.batchminor import BmKmsPhase1
        from ..kernels.fused_mx import MxKmsPhase1
        from ..kernels.fused_mx2 import MxKmsKeys

        z = jnp.zeros((0,), dtype=jnp.uint32)
        if isinstance(phase1_keys, MxKmsKeys):
            engine = "mx2"
            brk_h, brk_s = phase1_keys.brk_mx, phase1_keys.brk_mx_shoup
        elif isinstance(phase1_keys, MxKmsPhase1):
            engine = "mx"
            brk_h, brk_s = phase1_keys.brk_mx, phase1_keys.brk_mx_shoup
            p1k = dataclasses.replace(phase1_keys, brk_mx=z, brk_mx_shoup=z)
        elif isinstance(phase1_keys, BmKmsPhase1):
            engine = "bm"
            brk_h, brk_s = phase1_keys.brk_bm, phase1_keys.brk_bm_shoup
            p1k = dataclasses.replace(phase1_keys, brk_bm=z, brk_bm_shoup=z)
        else:
            raise TypeError(f"unknown phase1_keys type {type(phase1_keys)}")
    # phase 2 never touches scheme.brk_*; strip the largest key material
    # from the replicated operand so an all-gather of it is impossible
    # regardless of XLA dead-code elimination (brk reaches phase 1 via the
    # party-sharded brk_h/brk_s operands).
    return _bootstrap_shardmap(
        ct, kms.drop_brk(scheme), params, mesh, pallas_ntt, interpret, engine,
        p1k, brk_h, brk_s,
    )
