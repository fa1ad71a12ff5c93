"""Perf sweep on the real chip: all engines/schemes, chained timing.

Writes one JSON line per configuration to stdout and a summary to
perf_results.json.  Usage: python scripts/perf_sweep.py [configs...]
where configs are e.g. cggi:64 cggi-bm:64 kms2:16 kms8:8 (default: all).
"""

import json
import sys
import time

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def chain_time(boot, chain_step, first_ct, reps):
    out = boot(first_ct)
    np.asarray(out.b)
    t0 = time.time()
    cur = out
    for _ in range(reps):
        cur = boot(chain_step(cur))
    # hard device->host fetch: on this machine's TPU tunnel
    # block_until_ready can return before execution finishes, so only a
    # value read is a trustworthy fence.
    np.asarray(cur.b)
    return (time.time() - t0) / reps, out


def run_config(name: str, batch: int, reps: int = 8):
    from mktfhe_tpu.schemes.gates import (
        gate_affine,
        lwe_decrypt_bit,
        lwe_decrypt_bit_mk,
        lwe_encrypt_bit,
        lwe_ith_encrypt_bit,
    )

    rng = np.random.default_rng(0)
    m1 = rng.integers(0, 2, batch).astype(bool)
    m2 = rng.integers(0, 2, batch).astype(bool)
    t0 = time.time()

    if name.startswith("cggi"):
        from mktfhe_tpu.schemes import cggi
        from mktfhe_tpu.schemes.presets import CGGI_PARAM as params

        lwe_key, _r, scheme = cggi.setup(jax.random.key(0), params)
        jax.block_until_ready(scheme.brk_hat)
        keygen_s = time.time() - t0
        ct2 = lwe_encrypt_bit(jax.random.key(2), jnp.array(m2), lwe_key, params.alpha, (batch,))
        c1 = lwe_encrypt_bit(jax.random.key(3), jnp.array(m1), lwe_key, params.alpha, (batch,))
        if name == "cggi-bm":
            from mktfhe_tpu.kernels.batchminor import bootstrap_bm, convert_scheme

            bm = convert_scheme(scheme, params)
            jax.block_until_ready(bm.brk_bm)
            boot = lambda ct: bootstrap_bm(ct, bm, params)
        elif name == "cggi-fused":
            from mktfhe_tpu.kernels.batchminor import convert_scheme
            from mktfhe_tpu.kernels.fused_step import bootstrap_fused

            bm = convert_scheme(scheme, params)
            jax.block_until_ready(bm.brk_bm)
            boot = lambda ct: bootstrap_fused(ct, bm, params)
        else:
            boot = lambda ct: cggi.bootstrap(ct, scheme, params)
        decrypt = lambda o: lwe_decrypt_bit(o, lwe_key)
    elif name.startswith("lmss"):
        from mktfhe_tpu.schemes import lmss
        from mktfhe_tpu.schemes.presets import BLOCK_PARAM as params

        lwe_key, _r, scheme = lmss.setup(jax.random.key(0), params)
        jax.block_until_ready(scheme.brk_hat)
        keygen_s = time.time() - t0
        ct2 = lwe_encrypt_bit(jax.random.key(2), jnp.array(m2), lwe_key, params.alpha, (batch,))
        c1 = lwe_encrypt_bit(jax.random.key(3), jnp.array(m1), lwe_key, params.alpha, (batch,))
        if name.endswith("-pl"):
            boot = lambda ct: lmss.bootstrap(ct, scheme, params, pallas_ntt=True)
        else:
            boot = lambda ct: lmss.bootstrap(ct, scheme, params)
        decrypt = lambda o: lwe_decrypt_bit(o, lwe_key)
    else:
        from mktfhe_tpu.schemes import kms, ccs
        from mktfhe_tpu.schemes.presets import ALL_PRESETS

        if name.startswith("ccs"):
            k = int(name[3:].replace("-pl", ""))
            params = ALL_PRESETS[f"CCS{k}party"]
            mod = ccs
            crs_v = mod.crs(jax.random.key(0), params)
            parties = [mod.party_keygen(jax.random.key(1 + i), crs_v, params) for i in range(k)]
            scheme = mod.setup(crs_v, [p[2] for p in parties], params)
        else:
            bm = name.endswith(("-bm", "-mx2", "-mx3"))
            kstr = name[3:].replace("-bm", "").replace("-pl", "").replace("-mx3", "").replace("-mx2", "")
            block = kstr.endswith("block")
            if block:
                kstr = kstr[:-5]
            k = int(kstr)
            params = ALL_PRESETS[f"KMS{k}party" + ("block" if block else "")]
            mod = kms
            crs_v = mod.crs(jax.random.key(0), params)
            parties = [mod.party_keygen(jax.random.key(1 + i), crs_v, params) for i in range(k)]
            scheme = mod.setup(crs_v, [p[3] for p in parties], params, with_brk=not bm)
        lwe_keys = [p[0] for p in parties]
        jax.block_until_ready(jax.tree_util.tree_leaves(scheme)[0])
        keygen_s = time.time() - t0
        ct2 = lwe_ith_encrypt_bit(jax.random.key(2), jnp.array(m2), 1, lwe_keys[1], params.alpha, k, (batch,))
        c1 = lwe_ith_encrypt_bit(jax.random.key(3), jnp.array(m1), 0, lwe_keys[0], params.alpha, k, (batch,))
        if name.startswith("kms") and name.endswith("-bm"):
            from mktfhe_tpu.kernels.batchminor import build_bm_kms_phase1

            bm_keys = build_bm_kms_phase1([p[3] for p in parties], params)
            jax.block_until_ready(bm_keys.brk_bm)
            boot = lambda ct: mod.bootstrap_bm(ct, scheme, bm_keys, params, pallas_ntt=True)
        elif name.startswith("kms") and name.endswith("-mx3"):
            from mktfhe_tpu.kernels.fused_mx3 import bootstrap_mx3, build_mx3_kms_keys

            # k >= 16: drop the stored Shoup table (halves key HBM; the
            # kernel derives approximate companions in-kernel) and release
            # each party's torus brk as it converts (peak-HBM cap)
            pks = [p[3] for p in parties]
            parties = [(p[0], p[1], p[2], None) for p in parties]
            mx_keys = build_mx3_kms_keys(
                pks, params, store_shoup=k < 16, consume_brk=True
            )
            del pks
            jax.block_until_ready(mx_keys.brk_mx)
            boot = lambda ct: bootstrap_mx3(ct, scheme, mx_keys, params, pallas_ntt=True)
        elif name.startswith("kms") and name.endswith("-mx2"):
            from mktfhe_tpu.kernels.fused_mx2 import bootstrap_mx2, build_mx_kms_keys

            mx_keys = build_mx_kms_keys([p[3] for p in parties], params)
            jax.block_until_ready(mx_keys.brk_mx)
            boot = lambda ct: bootstrap_mx2(ct, scheme, mx_keys, params, pallas_ntt=True)
        elif name.endswith("-pl"):
            boot = lambda ct: mod.bootstrap(ct, scheme, params, pallas_ntt=True)
        else:
            boot = lambda ct: mod.bootstrap(ct, scheme, params)
        decrypt = lambda o: lwe_decrypt_bit_mk(o, lwe_keys)

    first = gate_affine(0, c1, ct2)
    dt, out = chain_time(boot, lambda prev: gate_affine(0, prev, ct2), first, reps)
    ok = bool(np.array_equal(np.asarray(decrypt(out)), ~(m1 & m2)))
    rec = {
        "config": name,
        "batch": batch,
        "keygen_s": round(keygen_s, 1),
        "ms_per_call": round(dt * 1e3, 2),
        "us_per_gate": round(dt / batch * 1e6, 1),
        "bootstraps_per_sec": round(batch / dt, 1),
        "decrypt_ok": ok,
    }
    # roofline (BASELINE.md item 4): static cost model vs measured time
    try:
        from mktfhe_tpu.utils.profiling import ccs_cost, cggi_cost, kms_cost, lmss_cost

        cost = None
        if name.startswith("cggi"):
            cost = cggi_cost(params, nprimes=params.nprimes)
        elif name.startswith("lmss"):
            cost = lmss_cost(params, nprimes=params.nprimes)
        elif name.startswith("ccs"):
            cost = ccs_cost(params, nprimes=params.nprimes)
        elif name.startswith("kms") and "block" not in name:
            cost = kms_cost(
                params,
                engine="mx" if name.endswith(("-mx2", "-mx3")) else "ref",
                nprimes=params.ring_nprimes,
            )
        if cost is not None:
            s = cost.summary(batch, dt)
            rec["vpu_utilization"] = round(s["vpu_utilization"], 3)
            rec["vpu_bound_ms_per_gate"] = round(s["vpu_bound_ms"], 3)
            rec["mxu_bound_ms_per_gate"] = round(s["mxu_bound_ms"], 4)
    except Exception as e:
        rec["roofline_error"] = repr(e)[:120]
    print(json.dumps(rec), flush=True)
    return rec


def main():
    args = sys.argv[1:] or [
        "cggi:64", "cggi:256", "cggi-bm:64", "cggi-bm:256",
        "cggi-fused:64", "cggi-fused:256",
        "lmss:64", "lmss-pl:64", "ccs2:16", "ccs2-pl:16",
        "kms2-mx3:128", "kms2-bm:16", "kms8-mx2:128", "kms8-mx3:128",
        "kms8block-mx3:128", "kms16-mx3:128",
    ]
    # MERGE into perf_results.json (round-4 verdict, weak 2: a partial
    # re-run must not clobber the committed full sweep)
    try:
        with open("perf_results.json") as f:
            prior = {(r.get("config"), r.get("batch")): r for r in json.load(f)}
    except (OSError, ValueError):
        prior = {}
    for spec in args:
        name, batch = spec.split(":")
        try:
            rec = run_config(name, int(batch))
        except Exception as e:  # keep sweeping
            rec = {"config": name, "batch": int(batch), "error": repr(e)[:300]}
            print(json.dumps(rec), flush=True)
        prior[(name, int(batch))] = rec
        with open("perf_results.json", "w") as f:
            json.dump(list(prior.values()), f, indent=1)


if __name__ == "__main__":
    main()
