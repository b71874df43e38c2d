"""TPU timing: shipped two-pass backward vs fused single-pass backward.

Protocol: 12 layer-equivalents per jit call, distinct inputs, scalar
readback (axon relay memoizes and has a ~25 ms call floor)."""
import sys
import time

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts/kexp")

import functools

import jax
import jax.numpy as jnp
import numpy as np

from smb_vision_tpu.ops.attention import _flash, _fwd
from bwd_fused import bwd_fused, LOG2E

H, N, D = 12, 20480, 64
LAYERS = 12
FLOPS_FWD = 4 * N * N * D * H
scale = 1.0 / np.sqrt(D)

BQ, BK = 4096, 2048
FBQ, FBK = 2048, 2048  # fused bwd tiles


@functools.partial(jax.custom_vjp)
def flash_fused(q, k, v):
    out, _ = _fwd(q, k, v, scale=scale, block_q=BQ, block_k=BK)
    return out


def _ffwd(q, k, v):
    out, lse = _fwd(q, k, v, scale=scale, block_q=BQ, block_k=BK)
    return out, (q, k, v, out, lse)


def _fbwd(res, g):
    q, k, v, out, lse = res
    bh, nq, d = q.shape
    if lse.ndim == 3 and lse.shape[-1] == 128:
        lse = lse.reshape(bh, nq)[..., None]
    delta = jnp.sum(g.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    return bwd_fused(qs, k, v, g, lse, delta, scale=scale,
                     block_q=FBQ, block_k=FBK)


flash_fused.defvjp(_ffwd, _fbwd)


def mk(i):
    ks = jax.random.split(jax.random.PRNGKey(i), 3)
    return [(jax.random.normal(kk, (H, N, D)) * 0.5).astype(jnp.bfloat16)
            for kk in ks]


def timeit(run):
    float(run(0))
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        float(run(100 + i))
        times.append(time.perf_counter() - t0)
    return min(times) / LAYERS


def main():
    print("device:", jax.devices()[0].device_kind)

    @jax.jit
    def fb_ship(q, k, v):
        def loss(q):
            out = q
            for _ in range(LAYERS):
                out = _flash(out, k, v, scale, BQ, BK, False)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jnp.sum(jax.grad(loss)(q).astype(jnp.float32))

    @jax.jit
    def fb_fused(q, k, v):
        def loss(q):
            out = q
            for _ in range(LAYERS):
                out = flash_fused(out, k, v)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jnp.sum(jax.grad(loss)(q).astype(jnp.float32))

    cache = {}

    def runner(fn):
        def run(i):
            if i not in cache:
                cache[i] = mk(i)
            q, k, v = cache[i]
            return fn(q, k, v)
        return run

    # numerics cross-check on one small-ish call (same shape, compare grads)
    q, k, v = mk(7)

    @jax.jit
    def g2(q, k, v):
        a = jax.grad(lambda q: jnp.sum(
            _flash(q, k, v, scale, BQ, BK, False).astype(jnp.float32) ** 2))(q)
        b = jax.grad(lambda q: jnp.sum(
            flash_fused(q, k, v).astype(jnp.float32) ** 2))(q)
        return (jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max(),
                jnp.abs(b.astype(jnp.float32)).max())

    eff = FLOPS_FWD * 3.5
    t = timeit(runner(fb_fused))
    print(f"fwd+bwd FUSED:   {t*1e3:7.2f} ms/layer  {eff/t/1e12:6.1f} "
          f"TFLOP/s eff ({eff/t/1e12/197*100:4.1f}% of bf16 peak)")
    t = timeit(runner(fb_ship))
    print(f"fwd+bwd shipped: {t*1e3:7.2f} ms/layer  {eff/t/1e12:6.1f} "
          f"TFLOP/s eff ({eff/t/1e12/197*100:4.1f}% of bf16 peak)")
    d, m = g2(q, k, v)
    print(f"dq fused-vs-shipped max abs diff {float(d):.5f} "
          f"(max |dq| {float(m):.3f})")


if __name__ == "__main__":
    main()
