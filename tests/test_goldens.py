"""Golden regression vectors (SURVEY.md section 4b analogue).

The Julia reference cannot run in this image, so the cross-validation
anchor is a set of deterministic golden vectors produced by this
framework itself: fixed seeds -> fixed keys/ciphertexts -> fixed
bootstrap output.  Any change to the arithmetic (NTT, CRT, decomposition,
engines) that alters ciphertext bits fails here.
"""

import hashlib

import jax
import jax.numpy as jnp
import numpy as np

from mktfhe_tpu.ring import PRIMES, fwd_ntt, lift_u32, make_crt_plan, make_plan
from mktfhe_tpu.schemes import cggi
from mktfhe_tpu.schemes.gates import gate_affine, lwe_encrypt_bit

from test_cggi import TINY


def _digest(*arrays) -> str:
    h = hashlib.sha256()
    for a in arrays:
        h.update(np.ascontiguousarray(np.asarray(a)).tobytes())
    return h.hexdigest()[:16]


def test_ntt_golden():
    plan = make_plan(64, 2)
    crt = make_crt_plan(2)
    x = jnp.arange(64, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
    hat = fwd_ntt(lift_u32(x, crt), plan)
    assert _digest(hat) == "637359dca9253afc", _digest(hat)


def test_cggi_bootstrap_golden():
    lwe_key, _rk, scheme = cggi.setup(jax.random.key(7), TINY)
    m = jnp.array([True, False, True, True])
    ct1 = lwe_encrypt_bit(jax.random.key(1), m, lwe_key, TINY.alpha, (4,))
    ct2 = lwe_encrypt_bit(jax.random.key(2), ~m, lwe_key, TINY.alpha, (4,))
    out = cggi.bootstrap(gate_affine(0, ct1, ct2), scheme, TINY)
    assert _digest(out.b, out.a) == "544bd48d5be989c3", _digest(out.b, out.a)
