"""Hardware-ceiling microbenchmarks for the MXU-NTT engine design.

Measures on the real chip, with data-dependent chains (block_until_ready is
unreliable on this tunnel runtime -- see bench.py):

  1. int8 MXU matmul TOPS at the NTT stage-A shape ([M,128]@[128,128]).
  2. batched int8 matmul as the limb-NTT would issue it.
  3. VPU u32 Shoup-modmul throughput (the current engine's inner op).
  4. VPU u32 plain multiply-add throughput.
  5. The bm-engine external-product pointwise contraction.
  6. fwd_ntt (jnp) and fwd_ntt_pallas per-poly cost at KMS shapes.

Each prints ops/s and the implied ceiling for KMS8 phase 1.
"""

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_enable_x64", True)


def chain_time(fn, x, reps=20, warm=2):
    """Time a data-dependent chain of fn applications."""
    for _ in range(warm):
        x = fn(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    t0 = time.time()
    for _ in range(reps):
        x = fn(x)
    np.asarray(jax.tree_util.tree_leaves(x)[0]).ravel()[:1]
    return (time.time() - t0) / reps


def bench_mxu_int8(m=1 << 16, reps=20):
    w = jnp.array(np.random.randint(-128, 128, (128, 128)), jnp.int8)

    @jax.jit
    def step(x):
        y = jax.lax.dot_general(
            x, w, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        # cheap dependency: cast back down (clip to int8)
        return (y & 127).astype(jnp.int8)

    x = jnp.array(np.random.randint(-128, 128, (m, 128)), jnp.int8)
    dt = chain_time(step, x, reps)
    macs = m * 128 * 128
    print(f"mxu_int8 [{m},128]@[128,128]: {dt*1e6:.1f} us -> {2*macs/dt/1e12:.1f} TOPS")
    return 2 * macs / dt


def bench_mxu_int8_batched(b=9, m=1 << 14, reps=20):
    """Batched: one matmul per (prime, limb-pair) as the limb-NTT issues."""
    w = jnp.array(np.random.randint(-128, 128, (b, 128, 128)), jnp.int8)

    @jax.jit
    def step(x):
        y = jax.lax.dot_general(
            x, w, (((2,), (1,)), ((0,), (0,))), preferred_element_type=jnp.int32
        )
        return (y & 127).astype(jnp.int8)

    x = jnp.array(np.random.randint(-128, 128, (b, m, 128)), jnp.int8)
    dt = chain_time(step, x, reps)
    macs = b * m * 128 * 128
    print(f"mxu_int8_batched [{b},{m},128]@[{b},128,128]: {dt*1e6:.1f} us -> {2*macs/dt/1e12:.1f} TOPS")
    return 2 * macs / dt


def bench_vpu_shoup(m=1 << 22, chain=16, reps=20):
    from mktfhe_tpu.ring.modring import shoup, shoup_mul

    p = 715825153
    w = 123456789 % p
    wsh = shoup(w, p)

    @jax.jit
    def step(x):
        for _ in range(chain):
            x = shoup_mul(jnp.uint32(w), jnp.uint32(wsh), x, p)
        return x

    x = jnp.array(np.random.randint(0, p, m), jnp.uint32)
    dt = chain_time(step, x, reps)
    muls = m * chain
    print(f"vpu_shoup_mul {m}x{chain}: {dt*1e6:.1f} us -> {muls/dt/1e9:.1f} Gmodmul/s")
    return muls / dt


def bench_vpu_muladd(m=1 << 22, chain=32, reps=20):
    @jax.jit
    def step(x):
        for _ in range(chain):
            x = x * jnp.uint32(2654435761) + jnp.uint32(12345)
        return x

    x = jnp.array(np.random.randint(0, 1 << 31, m), jnp.uint32)
    dt = chain_time(step, x, reps)
    ops = m * chain * 2
    print(f"vpu_u32_muladd {m}x{chain}: {dt*1e6:.1f} us -> {ops/dt/1e12:.2f} Tops(u32)")
    return ops / dt


def bench_vpu_mulhi(m=1 << 22, chain=16, reps=20):
    from mktfhe_tpu.ring.modring import mulhi_u32

    @jax.jit
    def step(x):
        for _ in range(chain):
            x = mulhi_u32(x, x | jnp.uint32(1)) + jnp.uint32(1)
        return x

    x = jnp.array(np.random.randint(0, 1 << 31, m), jnp.uint32)
    dt = chain_time(step, x, reps)
    print(f"vpu_mulhi {m}x{chain}: {dt*1e6:.1f} us -> {m*chain/dt/1e9:.1f} Gmulhi/s")
    return m * chain / dt


def bench_pointwise_ext(g=128, reps=10):
    """The bm-engine external-product contraction at KMS8 shapes."""
    from mktfhe_tpu.ring.modring import modsum, shoup_mul

    npr, rows, l, n = 3, 3, 4, 2048
    p = np.array([715825153, 715726849, 715694081], np.uint32).reshape(
        npr, 1, 1, 1, 1, 1
    )
    brk_h = jnp.array(
        np.random.randint(0, 1 << 30, (npr, 2 * l, 2, n)), jnp.uint32
    )
    brk_s = jnp.array(
        np.random.randint(0, 1 << 30, (npr, 2 * l, 2, n)), jnp.uint32
    )

    @jax.jit
    def step(dhat):
        prods = shoup_mul(
            brk_h[:, None, :, :, :, None],
            brk_s[:, None, :, :, :, None],
            dhat[:, :, :, None],
            p[..., None],
        )
        ehat = modsum(prods, 2, jnp.asarray(p[..., None]))  # [npr,rows,2,N,G]
        # dependency: tile back to dhat shape
        out = jnp.concatenate([ehat] * l, axis=2).reshape(npr, rows, 2 * l, n, g)
        return out & jnp.uint32((1 << 30) - 1)

    dhat = jnp.array(
        np.random.randint(0, 1 << 30, (npr, rows, 2 * l, n, g)), jnp.uint32
    )
    dt = chain_time(step, dhat, reps)
    muls = npr * rows * 2 * l * 2 * n * g
    print(f"pointwise_ext kms8-step shapes G={g}: {dt*1e6:.1f} us -> {muls/dt/1e9:.2f} Gmodmul/s ({dt*1e3:.3f} ms/step equiv)")
    return dt


def bench_ntt(g=128, reps=10):
    from mktfhe_tpu.ring.context import make_ring_ctx
    from mktfhe_tpu.ring.ntt import fwd_ntt

    ctx = make_ring_ctx(2048, 64, 3)
    polys = 24  # rows*2*l at KMS8

    @jax.jit
    def step(x):
        y = fwd_ntt(x, ctx.plan)
        return y & jnp.uint32((1 << 29) - 1)

    x = jnp.array(
        np.random.randint(0, 1 << 29, (g, polys, 3, 2048)), jnp.uint32
    )
    dt = chain_time(step, x, reps)
    np_polys = g * polys * 3
    print(f"fwd_ntt jnp [{g},{polys},3,2048]: {dt*1e3:.2f} ms -> {dt/np_polys*1e6:.2f} us/poly-prime")
    return dt


def bench_ntt_pallas_bm(g=128, reps=10):
    from mktfhe_tpu.kernels.ntt_pallas import fwd_ntt_pallas
    from mktfhe_tpu.ring.context import make_ring_ctx

    ctx = make_ring_ctx(2048, 64, 3)
    polys = 24

    @jax.jit
    def step(x):
        y = fwd_ntt_pallas(x, ctx.plan, g_tile=128)
        return y & jnp.uint32((1 << 29) - 1)

    x = jnp.array(
        np.random.randint(0, 1 << 29, (3, polys, 2048, g)), jnp.uint32
    )
    dt = chain_time(step, x, reps)
    np_polys = g * polys * 3
    print(f"fwd_ntt_pallas bm [3,{polys},2048,{g}]: {dt*1e3:.2f} ms -> {dt/np_polys*1e6:.2f} us/poly-prime")
    return dt


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "mxu"):
        bench_mxu_int8()
        bench_mxu_int8_batched()
    if which in ("all", "vpu"):
        bench_vpu_muladd()
        bench_vpu_mulhi()
        bench_vpu_shoup()
    if which in ("all", "point"):
        bench_pointwise_ext()
    if which in ("all", "ntt"):
        bench_ntt()
        bench_ntt_pallas_bm()
