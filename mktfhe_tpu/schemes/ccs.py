"""CCS19 multi-key TFHE bootstrapping.

Counterpart of the CCS pieces of the reference: scheme + CRS/party
keygen/setup (/root/reference/src/tfhe/scheme.jl:209-252), bootstrapping
key (keygen.jl:57-83), hybrid-product blind rotation
(bootstrapping.jl:234-328) and per-party key switch
(bootstrapping.jl:333-364).

Each of the k parties runs keygen independently against a common reference
string (CRS); the ciphertext mask grows party-by-party, so the blind
rotation is a static Python loop over parties (each party's n-bit scan
compiles with exactly the component count it touches), and the key switch
batches one int8 matmul per party over the party axis.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..ciphertext.decomp import balanced_decomp
from ..ciphertext.keys import binary_lwe_key, binary_ring_key
from ..ciphertext.lwe import Lwe
from ..ciphertext.unienc import gen_b, sample_crs, unienc_encrypt
from ..ring.context import RingCtx, make_ring_ctx
from ..ring.sampler import rng_streams
from ..ring.modring import addmod, modsum, negmod, shoup_mul
from ..ring.ntt import fwd_ntt, inv_ntt, shoup_pair
from ..ring.torus import from_crt, lift, lift_signed_small, negacyclic_roll
from .common import build_ksk, initial_acc, keyswitch_per_party, mod_switch_2n
from .params import CcsParams

# top-level sampling streams consumed by keygen (ring/sampler.rng_streams)
KEYGEN_STREAMS = 5


class CcsPartyKey(NamedTuple):
    """One party's bootstrapping material, torus domain (BootKey_CCS,
    keygen.jl:57-83); serializable, what crosses the party boundary."""

    pub_b: jnp.ndarray  # [l_uni, N] public key against the CRS
    brk_d: jnp.ndarray  # [n, l_uni, N] uni-encryption masked vectors
    brk_f: jnp.ndarray  # [n, l_uni, 2, N] uni-encryption RLEV parts
    ksk_b: jnp.ndarray  # [NLIMB, R] int8, R = N*f*D/2
    ksk_a: jnp.ndarray  # [NLIMB, R, n] int8


@jax.tree_util.register_dataclass
@dataclass(frozen=True)
class CcsScheme:
    """Aggregated runtime state (reference CCS struct, scheme.jl:209-219)."""

    crs_hat: jnp.ndarray  # [l_uni, npr, N]
    crs_shoup: jnp.ndarray
    pub_b_hat: jnp.ndarray  # [k, l_uni, npr, N]
    pub_b_shoup: jnp.ndarray
    brk_d_hat: jnp.ndarray  # [k, n, l_uni, npr, N]
    brk_d_shoup: jnp.ndarray
    brk_f_hat: jnp.ndarray  # [k, n, l_uni, 2, npr, N]
    brk_f_shoup: jnp.ndarray
    ksk_b: jnp.ndarray  # [k, NLIMB, R]
    ksk_a: jnp.ndarray  # [k, NLIMB, R, n]


def _ctx(params: CcsParams) -> RingCtx:
    return make_ring_ctx(params.big_n, params.torus_bits, params.nprimes)


def crs(rng, params: CcsParams):
    """Common reference string (scheme.jl:409-410)."""
    return sample_crs(rng, params.l_uni, _ctx(params))


@functools.partial(jax.jit, static_argnames=("params",))
def party_keygen(rng, crs_polys, params: CcsParams):
    """Independent per-party keygen (scheme.jl:227-239, keygen.jl:57-83).

    Returns (lwe_key, ring_key, CcsPartyKey); only the CcsPartyKey crosses
    the party/trust boundary.
    """
    ctx = _ctx(params)
    k_lwe, k_ring, k_b, k_brk, k_ksk = rng_streams(rng, KEYGEN_STREAMS)
    lwe_key = binary_lwe_key(k_lwe, params.n, jnp.uint32)
    ring_key = binary_ring_key(k_ring, 1, ctx)

    pub_b = gen_b(k_b, crs_polys, ring_key, params.beta, ctx)

    rngs = jax.random.split(k_brk, params.n)
    uni = jax.vmap(
        lambda r, bit: unienc_encrypt(
            r, bit, crs_polys, ring_key, params.beta, params.l_uni,
            params.log_b_uni, ctx,
        )
    )(rngs, lwe_key.key)

    ksk_b, ksk_a = build_ksk(
        k_ksk, ring_key.key[0], lwe_key, params.f, params.log_d, params.alpha
    )
    return lwe_key, ring_key, CcsPartyKey(
        pub_b=pub_b, brk_d=uni.d, brk_f=uni.f, ksk_b=ksk_b, ksk_a=ksk_a
    )


@functools.partial(jax.jit, static_argnames=("params",))
def setup(crs_polys, party_keys: list[CcsPartyKey], params: CcsParams) -> CcsScheme:
    """Aggregate party keys into the runtime scheme (scheme.jl:244-252):
    transform everything to the NTT domain with Shoup companions."""
    ctx = _ctx(params)

    def hat(x):
        h = fwd_ntt(lift(x, ctx.crt), ctx.plan)
        return h, shoup_pair(h, ctx.plan)

    crs_hat, crs_shoup = hat(crs_polys)
    pub_hat, pub_shoup = hat(jnp.stack([pk.pub_b for pk in party_keys]))
    d_hat, d_shoup = hat(jnp.stack([pk.brk_d for pk in party_keys]))
    f_hat, f_shoup = hat(jnp.stack([pk.brk_f for pk in party_keys]))
    return CcsScheme(
        crs_hat=crs_hat,
        crs_shoup=crs_shoup,
        pub_b_hat=pub_hat,
        pub_b_shoup=pub_shoup,
        brk_d_hat=d_hat,
        brk_d_shoup=d_shoup,
        brk_f_hat=f_hat,
        brk_f_shoup=f_shoup,
        ksk_b=jnp.stack([pk.ksk_b for pk in party_keys]),
        ksk_a=jnp.stack([pk.ksk_a for pk in party_keys]),
    )


def _decomp_hat(x, l, log_b, ctx, fwd=fwd_ntt):
    """balanced decomp + NTT: [..., N] -> [..., l, npr, N]."""
    d = jnp.moveaxis(balanced_decomp(x, l, log_b), -1, -2)
    return fwd(lift_signed_small(d, ctx.crt), ctx.plan)


def _hybrid_rotate_party(acc, tildea_p, p1, scheme: CcsScheme, params: CcsParams, ctx: RingCtx, pallas_ntt: bool = False, interpret: bool = False):
    """Party p1's (1-based) n-bit hybrid-product rotation
    (bootstrapping.jl:259-327).  Touches components 0..p1 of acc."""
    l, log_b = params.l_uni, params.log_b_uni
    p = ctx.plan.primes[:, None]
    from .kms import _ntt_fns

    fwd, inv = _ntt_fns(pallas_ntt, interpret)

    def step(acc, xs):
        d_h, d_s, f_h, f_s, ta = xs
        sl = acc[:, : p1 + 1]  # [G, p1+1, N]
        dhat = _decomp_hat(sl, l, log_b, ctx, fwd)  # [G, p1+1, l, npr, N]

        # u: every component contracted with this party's d-vector
        # (bootstrapping.jl:278-284)
        u = modsum(shoup_mul(d_h[None, None], d_s[None, None], dhat, p), -3, p)

        # v_0 = -sum_j G^-1(b)_j * crs_j ; v_i = sum_j G^-1(a_i)_j * pub_b[i]_j
        # (bootstrapping.jl:287-294)
        v0 = negmod(
            modsum(
                shoup_mul(
                    scheme.crs_hat[None], scheme.crs_shoup[None], dhat[:, 0], p
                ),
                -3,
                p,
            ),
            p,
        )
        pub_h = scheme.pub_b_hat[:p1][None]  # [1, p1, l, npr, N]
        pub_s = scheme.pub_b_shoup[:p1][None]
        vi = modsum(shoup_mul(pub_h, pub_s, dhat[:, 1:], p), -3, p)
        v = jnp.concatenate([v0[:, None], vi], axis=1)  # [G, p1+1, npr, N]
        v_t = from_crt(inv(v, ctx.plan), ctx.crt, ctx.dtype)

        # w: relinearize v against f (bootstrapping.jl:305-320)
        vhat = _decomp_hat(v_t, l, log_b, ctx, fwd)  # [G, p1+1, l, npr, N]
        vflat = vhat.reshape(vhat.shape[0], -1, *vhat.shape[-2:])
        fb = jnp.tile(f_h[:, 0], (p1 + 1, 1, 1))  # [(p1+1)*l, npr, N]
        fb_s = jnp.tile(f_s[:, 0], (p1 + 1, 1, 1))
        fa = jnp.tile(f_h[:, 1], (p1 + 1, 1, 1))
        fa_s = jnp.tile(f_s[:, 1], (p1 + 1, 1, 1))
        w_b = modsum(shoup_mul(fb[None], fb_s[None], vflat, p), -3, p)
        w_a = modsum(shoup_mul(fa[None], fa_s[None], vflat, p), -3, p)

        tacc = u.at[:, 0].set(addmod(u[:, 0], w_b, p))
        tacc = tacc.at[:, p1].set(addmod(tacc[:, p1], w_a, p))

        e = from_crt(inv(tacc, ctx.plan), ctx.crt, ctx.dtype)
        rolled = jax.vmap(negacyclic_roll)(e, ta.astype(jnp.int32))
        return acc.at[:, : p1 + 1].add(rolled - e), None

    idx = p1 - 1
    acc, _ = jax.lax.scan(
        step,
        acc,
        (
            scheme.brk_d_hat[idx],
            scheme.brk_d_shoup[idx],
            scheme.brk_f_hat[idx],
            scheme.brk_f_shoup[idx],
            tildea_p.T,
        ),
    )
    return acc


@functools.partial(jax.jit, static_argnames=("params", "pallas_ntt", "interpret"))
def bootstrap(ct: Lwe, scheme: CcsScheme, params: CcsParams, pallas_ntt: bool = False, interpret: bool = False) -> Lwe:
    """Multi-key gate bootstrap (bootstrapping.jl:4-27 with CCS dispatch).

    ct: Lwe with b [G], a [G, k*n].
    """
    ctx = _ctx(params)
    tildeb, tildea = mod_switch_2n(ct, params.big_n)
    acc = initial_acc(tildeb, params.big_n, params.k, ctx.dtype)
    tild = tildea.reshape(tildea.shape[0], params.k, params.n)
    for p1 in range(1, params.k + 1):
        acc = _hybrid_rotate_party(
            acc, tild[:, p1 - 1], p1, scheme, params, ctx, pallas_ntt, interpret
        )
    return keyswitch_per_party(acc, scheme.ksk_b, scheme.ksk_a, params.f, params.log_d)
