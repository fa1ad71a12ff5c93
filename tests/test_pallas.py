"""Pallas NTT kernel vs the jnp reference transform (interpret mode on CPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from mktfhe_tpu.kernels.ntt_pallas import fwd_ntt_pallas, inv_ntt_pallas
from mktfhe_tpu.ring import PRIMES, fwd_ntt, inv_ntt, make_plan


@pytest.mark.parametrize("n,npr", [(64, 2), (256, 3)])
def test_pallas_ntt_matches_jnp(n, npr):
    plan = make_plan(n, npr)
    rng = np.random.default_rng(5)
    r_dim, g = 4, 128
    x = np.stack(
        [
            rng.integers(0, PRIMES[q], size=(r_dim, n, g), dtype=np.uint32)
            for q in range(npr)
        ]
    )
    # reference path works in [..., npr, N]; ours is [npr, R, N, G]
    ref_in = jnp.asarray(np.moveaxis(x, (0, 2), (2, 3)))  # [R, G?]... -> [R, g, npr, n]
    ref_in = jnp.moveaxis(jnp.asarray(x), 3, 1)  # [npr, G, R, N]
    ref_in = jnp.moveaxis(ref_in, 0, 2)  # [G, R, npr, N]
    want_f = np.asarray(fwd_ntt(ref_in, plan))  # [G, R, npr, N]

    got_f = np.asarray(fwd_ntt_pallas(jnp.asarray(x), plan, g_tile=64, interpret=True))
    got_f_cmp = np.moveaxis(got_f, (0, 3), (2, 0))  # [G, R, npr, N]
    np.testing.assert_array_equal(got_f_cmp, want_f)

    got_rt = np.asarray(
        inv_ntt_pallas(jnp.asarray(got_f), plan, g_tile=64, interpret=True)
    )
    np.testing.assert_array_equal(got_rt, x)
