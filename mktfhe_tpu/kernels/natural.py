"""Natural-layout Pallas engine: reference data layout, fused-VMEM NTT.

Drop-in variant of the reference engine (schemes/cggi.py, schemes/kms.py)
that swaps the jnp NTT for the Pallas kernels operating on the standard
[..., nprimes, N] arrays (kernels/ntt_pallas.py `fwd_ntt_nat`/`inv_ntt_nat`
-- the prime axis folds into the minor dimension, so no transposes or key
re-layout are needed; the scheme objects are shared with the reference
engine).  Bit-identical outputs (tests/test_natural.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..ciphertext.decomp import balanced_decomp
from ..ciphertext.gsw import external_product_hat
from ..ciphertext.lwe import Lwe
from ..ring.context import make_ring_ctx
from ..ring.torus import from_crt, lift_signed_small, negacyclic_roll
from ..schemes.common import initial_acc, keyswitch_table, mod_switch_2n
from .ntt_pallas import fwd_ntt_nat, inv_ntt_nat


@functools.partial(jax.jit, static_argnames=("params", "interpret"))
def bootstrap_nat(ct: Lwe, scheme, params, interpret: bool = False) -> Lwe:
    """CGGI gate bootstrap with Pallas NTTs in the natural layout.

    scheme: schemes.cggi.CggiScheme (unchanged).
    """
    ctx = make_ring_ctx(params.big_n, params.torus_bits, params.nprimes)
    tildeb, tildea = mod_switch_2n(ct, params.big_n)
    acc = initial_acc(tildeb, params.big_n, params.k, ctx.dtype)
    l, log_b = params.l_gsw, params.log_b_gsw

    def step(acc, xs):
        brk_h, brk_s, ta = xs
        digits = jnp.moveaxis(balanced_decomp(acc, l, log_b), -1, -2)
        dhat = fwd_ntt_nat(
            lift_signed_small(digits, ctx.crt), ctx.plan, interpret=interpret
        )
        ehat = external_product_hat(dhat, brk_h, brk_s, ctx)
        e = from_crt(inv_ntt_nat(ehat, ctx.plan, interpret=interpret), ctx.crt, ctx.dtype)
        rolled = jax.vmap(negacyclic_roll)(e, ta.astype(jnp.int32))
        return acc + rolled - e, None

    acc, _ = jax.lax.scan(step, acc, (scheme.brk_hat, scheme.brk_shoup, tildea.T))
    return keyswitch_table(acc, scheme.ksk_b, scheme.ksk_a, params.f, params.log_d)
