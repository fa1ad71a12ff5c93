"""Preset-parameter smoke tests (slow; full dimensions on CPU).

Run explicitly with: pytest tests/test_presets_slow.py -m slow
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from mktfhe_tpu.schemes import cggi, lmss
from mktfhe_tpu.schemes.gates import (
    gate_affine,
    lwe_decrypt_bit,
    lwe_encrypt_bit,
)
from mktfhe_tpu.schemes.presets import BLOCK_PARAM, CGGI_PARAM
from mktfhe_tpu.utils.noise import noise_report


@pytest.mark.parametrize(
    "mod,params", [(cggi, CGGI_PARAM), (lmss, BLOCK_PARAM)], ids=["CGGI", "Block"]
)
def test_preset_gate(mod, params):
    lwe_key, _rk, scheme = mod.setup(jax.random.key(0), params)
    g = 8
    rng = np.random.default_rng(0)
    m1 = rng.integers(0, 2, g).astype(bool)
    m2 = rng.integers(0, 2, g).astype(bool)
    ct1 = lwe_encrypt_bit(jax.random.key(1), jnp.array(m1), lwe_key, params.alpha, (g,))
    ct2 = lwe_encrypt_bit(jax.random.key(2), jnp.array(m2), lwe_key, params.alpha, (g,))
    out = mod.bootstrap(gate_affine(0, ct1, ct2), scheme, params)
    got = np.asarray(lwe_decrypt_bit(out, lwe_key))
    np.testing.assert_array_equal(got, ~(m1 & m2))
    rep = noise_report(out, [lwe_key], ~(m1 & m2))
    assert rep["margin_sigmas"] > 6, rep
