"""Compiled-path engine regression check (run on the real TPU).

Runs every Pallas engine COMPILED (interpret=False) at preset-like
dimensions and compares bit-exactly against the jnp reference engine on
the same ciphertexts -- catches Mosaic/compile-path regressions that the
interpret-mode CPU tests cannot (VERDICT round 1, weak item 5).

Exits nonzero on any divergence.  Usage:
    python scripts/engine_check.py [quick|full]
quick (default): CGGI at preset dims + KMS k=2 at N=2048 reduced n.
full: also KMS k=2 at the real preset (slower).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)

from mktfhe_tpu.schemes import cggi, kms
from mktfhe_tpu.schemes.gates import gate_affine, lwe_encrypt_bit, lwe_ith_encrypt_bit
from mktfhe_tpu.schemes.params import KmsParams
from mktfhe_tpu.schemes.presets import ALL_PRESETS, CGGI_PARAM

FAILURES = []


def check(label, got, want):
    same = bool(np.array_equal(np.asarray(got.b), np.asarray(want.b))) and bool(
        np.array_equal(np.asarray(got.a), np.asarray(want.a))
    )
    print(f"{label}: {'OK' if same else 'DIVERGED'}", flush=True)
    if not same:
        FAILURES.append(label)


def check_cggi(g=8):
    params = CGGI_PARAM
    lwe_key, _r, scheme = cggi.setup(jax.random.key(0), params)
    rng = np.random.default_rng(0)
    m1 = jnp.array(rng.integers(0, 2, g).astype(bool))
    m2 = jnp.array(rng.integers(0, 2, g).astype(bool))
    ct1 = lwe_encrypt_bit(jax.random.key(1), m1, lwe_key, params.alpha, (g,))
    ct2 = lwe_encrypt_bit(jax.random.key(2), m2, lwe_key, params.alpha, (g,))
    ct = gate_affine(0, ct1, ct2)
    ref = cggi.bootstrap(ct, scheme, params)

    from mktfhe_tpu.kernels.batchminor import bootstrap_bm, convert_scheme
    from mktfhe_tpu.kernels.fused_step import bootstrap_fused

    bm = convert_scheme(scheme, params)
    # NOTE: there is no separate 'cggi pallas_ntt' check anymore: CGGI's
    # jnp driver stopped taking a pallas_ntt flag when the batch-minor and
    # fused-step engines became the only Pallas paths for CGGI; the Pallas
    # NTT kernels themselves are covered on-chip transitively by the
    # lmss/ccs/kms pallas_ntt checks below (same kernels, same layouts).
    check("cggi batch-minor", bootstrap_bm(ct, bm, params), ref)
    check("cggi fused-step", bootstrap_fused(ct, bm, params), ref)


def check_kms(params, tag, g=128):
    # g=128 matches the production gate tile: the mx3 kernel bodies hit
    # the sweep's compile-cache shape; small-lane (g=8) wide-gadget
    # bodies wedged the remote Mosaic compiler (round 5).

    k = params.k
    a = kms.crs(jax.random.key(0), params)
    parties = [kms.party_keygen(jax.random.key(1 + i), a, params) for i in range(k)]
    scheme = kms.setup(a, [p[3] for p in parties], params)
    lwe_keys = [p[0] for p in parties]
    rng = np.random.default_rng(0)
    m1 = jnp.array(rng.integers(0, 2, g).astype(bool))
    m2 = jnp.array(rng.integers(0, 2, g).astype(bool))
    ct1 = lwe_ith_encrypt_bit(jax.random.key(11), m1, 0, lwe_keys[0], params.alpha, k, (g,))
    ct2 = lwe_ith_encrypt_bit(jax.random.key(12), m2, 1, lwe_keys[1], params.alpha, k, (g,))
    ct = gate_affine(0, ct1, ct2)
    ref = kms.bootstrap(ct, scheme, params)

    check(f"{tag} pallas_ntt", kms.bootstrap(ct, scheme, params, pallas_ntt=True), ref)

    from mktfhe_tpu.kernels.batchminor import build_bm_kms_phase1

    bm_keys = build_bm_kms_phase1([p[3] for p in parties], params)
    check(f"{tag} batch-minor", kms.bootstrap_bm(ct, scheme, bm_keys, params), ref)
    del bm_keys
    from mktfhe_tpu.kernels.fused_mx2 import bootstrap_mx2, build_mx_kms_keys

    mx2_keys = build_mx_kms_keys([p[3] for p in parties], params)
    check(f"{tag} mx2", bootstrap_mx2(ct, scheme, mx2_keys, params, g_tile=g), ref)

    if params.log_b_gsw <= 14:  # mx3 digit-split range (round 5)
        from mktfhe_tpu.kernels.fused_mx3 import bootstrap_mx3, build_mx3_kms_keys

        check(
            f"{tag} mx3",
            bootstrap_mx3(ct, scheme, mx2_keys, params, g_tile=g),
            ref,
        )
        del mx2_keys
        # no-stored-Shoup key mode (the KMS16 residency mode): in-kernel
        # approximate companions, must stay bit-identical
        ns_keys = build_mx3_kms_keys(
            [p[3] for p in parties], params, store_shoup=False
        )
        check(
            f"{tag} mx3-noshoup",
            bootstrap_mx3(ct, scheme, ns_keys, params, g_tile=g),
            ref,
        )


def check_kms_block(params, tag, g=128):
    """Block-binary preset through the mx3 block kernel (U/V split),
    compiled, vs the jnp reference engine."""
    from mktfhe_tpu.kernels.fused_mx3 import bootstrap_mx3, build_mx3_kms_keys

    k = params.k
    a = kms.crs(jax.random.key(0), params)
    parties = [kms.party_keygen(jax.random.key(1 + i), a, params) for i in range(k)]
    scheme = kms.setup(a, [p[3] for p in parties], params)
    lwe_keys = [p[0] for p in parties]
    rng = np.random.default_rng(0)
    m1 = jnp.array(rng.integers(0, 2, g).astype(bool))
    m2 = jnp.array(rng.integers(0, 2, g).astype(bool))
    ct1 = lwe_ith_encrypt_bit(jax.random.key(11), m1, 0, lwe_keys[0], params.alpha, k, (g,))
    ct2 = lwe_ith_encrypt_bit(jax.random.key(12), m2, 1, lwe_keys[1], params.alpha, k, (g,))
    ct = gate_affine(0, ct1, ct2)
    ref = kms.bootstrap(ct, scheme, params)
    keys3 = build_mx3_kms_keys([p[3] for p in parties], params)
    check(f"{tag} mx3-block", bootstrap_mx3(ct, scheme, keys3, params, g_tile=g), ref)


def main():
    mode = sys.argv[1] if len(sys.argv) > 1 else "quick"
    t0 = time.time()
    check_cggi()
    # reduced n keeps the jnp reference bootstrap affordable while N, the
    # gadget shape, and every kernel tile match the KMS2party preset
    # KMS2party's REAL gadget shape (l=3, log_b=12): exercises the mx3
    # wide-gadget digit split (nsplit=2) on chip (round 5)
    small = KmsParams(
        n=64, alpha=ALL_PRESETS["KMS2party"].alpha, f=7, log_d=2, big_n=2048,
        beta=ALL_PRESETS["KMS2party"].beta, l_gsw=3, log_b_gsw=12,
        l_lev=2, log_b_lev=10, l_uni=3, log_b_uni=10, k=2,
    )
    check_kms(small, "kms2-smalln")
    # KMS8-shaped gadget (log_b 9, nsplit=1): exercises the mx3 engine
    small9 = KmsParams(
        n=64, alpha=ALL_PRESETS["KMS8party"].alpha, f=7, log_d=2, big_n=2048,
        beta=ALL_PRESETS["KMS8party"].beta, l_gsw=4, log_b_gsw=9,
        l_lev=3, log_b_lev=6, l_uni=4, log_b_uni=8, k=2,
    )
    check_kms(small9, "kms2-smalln-b9")
    # KMS8partyblock-shaped block variant at reduced d: mx3 U/V block
    # kernel on chip (round 5)
    from mktfhe_tpu.schemes.params import KmsBlockParams

    small_blk = KmsBlockParams(
        d=22, ell=3, alpha=ALL_PRESETS["KMS8partyblock"].alpha, f=7, log_d=2,
        big_n=2048, beta=ALL_PRESETS["KMS8partyblock"].beta,
        l_gsw=4, log_b_gsw=9, l_lev=3, log_b_lev=6, l_uni=4, log_b_uni=8, k=2,
    )
    check_kms_block(small_blk, "kms2-smalld-block")
    if mode == "full":
        check_kms(ALL_PRESETS["KMS2party"], "kms2-preset")
    print(f"engine_check {mode}: {len(FAILURES)} failures in {time.time()-t0:.0f}s")
    if FAILURES:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
