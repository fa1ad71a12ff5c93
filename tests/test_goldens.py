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
    # NOTE: this digest pins the eval-domain REPRESENTATION, so it changes
    # whenever ring.modring.PRIMES changes (round 5: 30-bit -> 29.4-bit
    # primes for the approximate-Shoup kernels).  The bootstrap goldens
    # below pin torus-domain ciphertext bits, which are prime-independent
    # (the NTT is only a means to exact integer convolution) -- they
    # survived the prime change unchanged, which is itself evidence the
    # pipeline stays exact.
    plan = make_plan(64, 2)
    crt = make_crt_plan(2)
    x = jnp.arange(64, dtype=jnp.uint32) * jnp.uint32(0x9E3779B9)
    hat = fwd_ntt(lift_u32(x, crt), plan)
    assert _digest(hat) == "f97a3773cff6b44e", _digest(hat)


def test_cggi_bootstrap_golden():
    lwe_key, _rk, scheme = cggi.setup(jax.random.key(7), TINY)
    m = jnp.array([True, False, True, True])
    ct1 = lwe_encrypt_bit(jax.random.key(1), m, lwe_key, TINY.alpha, (4,))
    ct2 = lwe_encrypt_bit(jax.random.key(2), ~m, lwe_key, TINY.alpha, (4,))
    out = cggi.bootstrap(gate_affine(0, ct1, ct2), scheme, TINY)
    assert _digest(out.b, out.a) == "544bd48d5be989c3", _digest(out.b, out.a)


def test_kms_mx2_bootstrap_golden():
    """Pins the full KMS mx2-engine pipeline (decomp, mx-NTT, external
    product, A*B monomial factors, Garner, phase 2, int8 key switch).
    All KMS engines are bit-identical (tests/test_fused_mx2.py), so this
    digest pins every engine's arithmetic at once."""
    from mktfhe_tpu.kernels.fused_mx2 import bootstrap_mx2, build_mx_kms_keys
    from mktfhe_tpu.schemes import kms
    from mktfhe_tpu.schemes.gates import lwe_ith_encrypt_bit
    from mktfhe_tpu.schemes.presets import TEST_PRESETS

    params = TEST_PRESETS["TinyKMS2partyMX"]
    a = kms.crs(jax.random.key(300), params)
    parties = [
        kms.party_keygen(jax.random.key(400 + i), a, params)
        for i in range(params.k)
    ]
    scheme = kms.setup(a, [p[3] for p in parties], params)
    mx_keys = build_mx_kms_keys([p[3] for p in parties], params)
    m = jnp.array([True, False, True, True])
    ct1 = lwe_ith_encrypt_bit(
        jax.random.key(1), m, 0, parties[0][0], params.alpha, params.k, (4,)
    )
    ct2 = lwe_ith_encrypt_bit(
        jax.random.key(2), ~m, 1, parties[1][0], params.alpha, params.k, (4,)
    )
    out = bootstrap_mx2(
        gate_affine(0, ct1, ct2), scheme, mx_keys, params, interpret=True, g_tile=4
    )
    got = _digest(out.b, out.a)
    assert got == "92d8cc645cbb9c54", got


def test_lmss_bootstrap_golden():
    """Pins the LMSS block-binary rotation + partial key switch (round-3
    verdict, weak #8: goldens previously skipped LMSS)."""
    from mktfhe_tpu.schemes import lmss

    from test_lmss import TINY as LTINY

    lwe_key, _rk, scheme = lmss.setup(jax.random.key(21), LTINY)
    m = jnp.array([True, False, False, True])
    ct1 = lwe_encrypt_bit(jax.random.key(1), m, lwe_key, LTINY.alpha, (4,))
    ct2 = lwe_encrypt_bit(jax.random.key(2), ~m, lwe_key, LTINY.alpha, (4,))
    out = lmss.bootstrap(gate_affine(0, ct1, ct2), scheme, LTINY)
    got = _digest(out.b, out.a)
    assert got == "f6f005a68d57657a", got


def test_ccs_bootstrap_golden():
    """Pins the CCS hybrid-product rotation + per-party key switch
    (round-3 verdict, weak #8: goldens previously skipped CCS)."""
    from mktfhe_tpu.schemes import ccs
    from mktfhe_tpu.schemes.gates import lwe_ith_encrypt_bit

    from test_ccs import TINY as CTINY

    a = ccs.crs(jax.random.key(500), CTINY)
    parties = [
        ccs.party_keygen(jax.random.key(600 + i), a, CTINY)
        for i in range(CTINY.k)
    ]
    scheme = ccs.setup(a, [p[2] for p in parties], CTINY)
    m = jnp.array([True, True, False, False])
    ct1 = lwe_ith_encrypt_bit(
        jax.random.key(1), m, 0, parties[0][0], CTINY.alpha, CTINY.k, (4,)
    )
    ct2 = lwe_ith_encrypt_bit(
        jax.random.key(2), ~m, 1, parties[1][0], CTINY.alpha, CTINY.k, (4,)
    )
    out = ccs.bootstrap(gate_affine(0, ct1, ct2), scheme, CTINY)
    got = _digest(out.b, out.a)
    assert got == "3279edf828ae6b40", got
