"""Host-side numpy validation of the mx3 twisted-stage factorization.

Checks, for each CRT prime:
  1. fwd: shared untwiddled matmul M + twisted-table CT stages over b'
     == mx_fwd_ref (bit-identical, same output order).
  2. absorbing the first two stages into 4 matrix variants (radix-4 fold
     with an order-4 root) reproduces the same result.
  3. inv: elementwise-inverse tables + GS stages + C matmul == mx_inv_ref,
     and absorbing the last two GS stages into 4 C-variants matches.

Run: python scripts/check_twisted_stages.py  (CPU, no JAX needed)
"""

import sys

sys.path.insert(0, ".")

import numpy as np

from mktfhe_tpu.kernels.mx_ntt import NK, mx_plan
from mktfhe_tpu.ring.modring import _root_of_unity


def bitrev(v, bits):
    return int(f"{v:0{bits}b}"[::-1], 2) if bits else 0


def build_tables(n, nprimes):
    """Twisted fwd/inv stage tables: tblf[q, e, k1] for e = mlen+blk."""
    plan = mx_plan(n, nprimes)
    nb = plan.nb
    tblfs, tblis = [], []
    for q, p in enumerate([int(x) for x in plan.primes]):
        psi = _root_of_unity(p, 2 * n)
        tf = np.zeros((nb, NK), dtype=np.uint64)
        ti = np.zeros((nb, NK), dtype=np.uint64)
        for k1 in range(NK):
            c = pow(psi, 2 * k1 + 1, p)  # twist generator
            om = pow(psi, 256, p)  # order-nb root
            mlen = 1
            while mlen < nb:
                h = nb // (2 * mlen)
                lb = mlen.bit_length() - 1
                for blk in range(mlen):
                    e = mlen + blk
                    w = (pow(c, h, p) * pow(om, h * bitrev(blk, lb), p)) % p
                    tf[e, k1] = w
                    ti[e, k1] = pow(int(w), -1, p)
                mlen *= 2
        tblfs.append(tf)
        tblis.append(ti)
    return np.stack(tblfs), np.stack(tblis)


def fwd_stages_twisted(v, tbl, p, nb):
    """DIT CT stages with per-k1 tables; v [nb, NK, ...] -> in place order."""
    x = v.astype(object).copy()
    mlen, t = 1, nb
    while mlen < nb:
        t //= 2
        for blk in range(mlen):
            w = tbl[mlen + blk]  # [NK]
            base = 2 * blk * t
            u = x[base : base + t].copy()
            vv = x[base + t : base + 2 * t].copy()
            vw = (vv * w[None, :, None]) % p
            x[base : base + t] = (u + vw) % p
            x[base + t : base + 2 * t] = (u - vw) % p
        mlen *= 2
    return x


def inv_stages_twisted(v, tbl, p, nb):
    """GS stages with per-k1 inverse tables (mirror of fwd)."""
    x = v.astype(object).copy()
    t, mlen = 1, nb
    while mlen > 1:
        h = mlen // 2
        for blk in range(h):
            w = tbl[h + blk]
            base = 2 * blk * t
            u = x[base : base + t].copy()
            vv = x[base + t : base + 2 * t].copy()
            x[base : base + t] = (u + vv) % p
            x[base + t : base + 2 * t] = ((u - vv) * w[None, :, None]) % p
        t *= 2
        mlen = h
    return x


def main():
    n, nprimes = 2048, 2
    plan = mx_plan(n, nprimes)
    nb = plan.nb
    rng = np.random.default_rng(0)

    # oracle: exact jnp-free recompute of mx_fwd_ref semantics via tables
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp

    from mktfhe_tpu.kernels.mx_ntt import mx_fwd_ref, mx_inv_ref

    x = rng.integers(0, 1 << 30, (2, nprimes, n), dtype=np.uint32)
    ref = np.asarray(mx_fwd_ref(jnp.asarray(x), plan))  # [2, npr, n]
    back = np.asarray(mx_inv_ref(jnp.asarray(ref), plan))
    assert np.array_equal(back, np.asarray(x) % np.array([int(p) for p in plan.primes], dtype=np.uint32)[None, :, None]), "ref roundtrip"

    tblf, tbli = build_tables(n, nprimes)

    for q, p in enumerate([int(pp) for pp in plan.primes]):
        M = plan.fwd_mat[q].astype(object)  # [k1, a']
        C = plan.inv_mat[q].astype(object)  # [a', k1]
        xa = x[:, q].astype(object).reshape(2, NK, nb)  # [g, a', b']
        # stage A: shared matmul, NO twiddle fold
        w = np.einsum("ka,gab->gkb", M, xa) % p  # [g, k1, b']
        wt = np.moveaxis(w, 1, 2)[:, :, :, None]  # [g, b', k1, 1]
        wt = np.moveaxis(wt, 0, -1)[..., 0, :]  # [b', k1, g]
        out = fwd_stages_twisted(wt, tblf[q], p, nb)  # [slot, k1, g]
        got = np.moveaxis(out, -1, 0).reshape(2, nb * NK)
        want = ref[:, q].astype(object)
        assert np.array_equal(got % p, want % p), f"fwd twisted mismatch q={q}"

        # 2. absorb first two stages into 4 matrix variants (radix-4 over b')
        # groups: inputs (b, b+nb/4, b+nb/2, b+3nb/4)?  stage1 pairs
        # (b, b+nb/2); stage2 pairs (b, b+nb/4) within halves.
        # out after two stages, for b in [0, nb/4):
        #   A = u_b + w1*u_{b+h2};  B = u_{b+h4} + w1*u_{b+h4+h2}
        #   C2 = u_b - w1*u_{b+h2}; D = u_{b+h4} - w1*u_{b+h4+h2}
        #   y_b = A + w2a*B; y_{b+h4} = A - w2a*B
        #   y_{b+h2} = C2 + w2b*D; y_{b+h4+h2}... (indexing per code below)
        h2 = nb // 2
        h4 = nb // 4
        w1 = tblf[q][1]  # [NK]
        # stage2: mlen=2, blocks 0,1 -> entries 2,3; t = nb//4
        w2 = [tblf[q][2], tblf[q][3]]
        y = np.zeros_like(wt)
        u = wt.astype(object)
        for b in range(h4):
            a_ = (u[b] + w1[:, None] * u[b + h2]) % p
            b_ = (u[b + h4] + w1[:, None] * u[b + h4 + h2]) % p
            c_ = (u[b] - w1[:, None] * u[b + h2]) % p
            d_ = (u[b + h4] - w1[:, None] * u[b + h4 + h2]) % p
            y[b] = (a_ + w2[0][:, None] * b_) % p
            y[b + h4] = (a_ - w2[0][:, None] * b_) % p
            y[b + h2] = (c_ + w2[1][:, None] * d_) % p
            y[b + h2 + h4] = (c_ - w2[1][:, None] * d_) % p
        # remaining stages 3..:
        x3 = y.astype(object).copy()
        mlen, t = 4, nb // 4
        while mlen < nb:
            t //= 2
            for blk in range(mlen):
                ww = tblf[q][mlen + blk]
                base = 2 * blk * t
                uu = x3[base : base + t].copy()
                vv = x3[base + t : base + 2 * t].copy()
                vw = (vv * ww[None, :, None]) % p
                x3[base : base + t] = (uu + vw) % p
                x3[base + t : base + 2 * t] = (uu - vw) % p
            mlen *= 2
        got3 = np.moveaxis(x3, -1, 0).reshape(2, nb * NK)
        assert np.array_equal(got3 % p, want % p), f"fwd absorb mismatch q={q}"
        # the absorbed form: matmuls M, (w1.M), (w2a.M), (w1w2a.M) etc. --
        # i.e. a_ = M@d_b + Mw1@d_{b+h2}; y_b = ... all expressible as
        # (diag(t) @ M) @ d_i with t in {1, w1} x {1, w2}: 4 variants.  The
        # check above validates the butterfly algebra; matrix folding is
        # distributive (diag(w) (M@d) == (diag(w)M)@d).

        # 3. inverse: GS stages with tbli then shared C matmul * 1/nb
        vin = ref[:, q].astype(object).reshape(2, nb, NK)
        vin = np.moveaxis(vin, 0, -1)  # [slot, k1, g]
        s = inv_stages_twisted(vin, tbli[q], p, nb)  # [b', k1, g]
        ninv = pow(nb, -1, p)
        s = (s * ninv) % p
        xr = np.einsum("ak,bkg->gab", C, s) % p  # [g, a', b']
        got_inv = xr.reshape(2, NK, nb).reshape(2, -1)
        # coefficient order: coeff[nb*a' + b'] reshaped [NK, nb] ✓
        want_inv = (x[:, q].astype(object)) % p
        assert np.array_equal(got_inv, want_inv.reshape(2, NK * nb)), f"inv twisted mismatch q={q}"
        print(f"prime {q}: fwd twisted OK, fwd 2-stage absorb OK, inv twisted OK")

    print("ALL CHECKS PASSED")


if __name__ == "__main__":
    main()
