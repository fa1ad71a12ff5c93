"""Multi-device mesh tests on the 8-way virtual CPU mesh (SURVEY.md sec 4d)."""

import jax
import numpy as np
import pytest

import __graft_entry__ as graft


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_dryrun_multichip():
    graft.dryrun_multichip(8)


def test_entry_compiles_and_runs():
    fn, args = graft.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    assert out.b.shape[0] == 4


def test_sharded_matches_single_device():
    """The party/batch-sharded KMS bootstrap must be bit-identical to the
    single-device path (same exact integer arithmetic, different layout)."""
    from mktfhe_tpu.parallel import kms_bootstrap_sharded, make_mesh, shard_scheme
    from mktfhe_tpu.schemes import kms

    params = graft._TINY_PARAMS
    ct, scheme = graft._make_inputs(params, g=4)
    ref = kms.bootstrap(ct, scheme, params)

    mesh = make_mesh(2, 4)
    sh = shard_scheme(scheme, mesh)
    out = kms_bootstrap_sharded(ct, sh, params, mesh)
    np.testing.assert_array_equal(np.asarray(out.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(out.a), np.asarray(ref.a))


def test_shardmap_matches_single_device():
    """Explicit shard_map phase 1 + all_gather: bit-identical too."""
    from mktfhe_tpu.parallel import kms_bootstrap_shardmap, make_mesh, shard_scheme
    from mktfhe_tpu.schemes import kms

    params = graft._TINY_PARAMS
    ct, scheme = graft._make_inputs(params, g=4)
    ref = kms.bootstrap(ct, scheme, params)

    mesh = make_mesh(2, 4)
    sh = shard_scheme(scheme, mesh)
    out = kms_bootstrap_shardmap(ct, sh, params, mesh)
    np.testing.assert_array_equal(np.asarray(out.b), np.asarray(ref.b))
    np.testing.assert_array_equal(np.asarray(out.a), np.asarray(ref.a))
