"""Projection (dense+bias) pallas vs XLA on-chip at the attention
shapes: fused-QKV (768 -> 2304) and out-proj (768 -> 768). Chain
protocol (each link consumes the previous output; distinct inputs;
scalar readback; min over passes)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from smb_vision_tpu.ops.projection import _plan, dense_forward

M = 20480


def mk(seed, shape, dtype=jnp.bfloat16, s=0.5):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
            * s).astype(dtype)


def timeit(label, fn, args_list, flops, links, n_pass=3):
    float(fn(*args_list[0]))
    times = []
    for _ in range(n_pass):
        for args in args_list[1:]:
            t0 = time.perf_counter()
            float(fn(*args))
            times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{label:34s} {t/links*1e3:8.3f} ms/link  "
          f"{flops/t/1e12:7.1f} TFLOP/s", flush=True)


def bench_pair(K, N, links=48):
    """Alternate K->N and N->K links (the qkv/out-proj pair when
    K=768, N=2304 covers both directions of the attention block)."""
    xs = [mk(i, (M, K)) for i in range(4)]
    wa, ba = mk(97, (K, N)), mk(99, (N,), jnp.float32) * 0.1
    wb, bb = mk(98, (N, K)), mk(100, (K,), jnp.float32) * 0.1
    flops = 2 * M * K * N * 2 * (links // 2)
    print(f"pair K={K} N={N} plan={_plan(M, K, N)}/{_plan(M, N, K)}",
          flush=True)

    def chain(impl):
        @jax.jit
        def f(x, wa, ba, wb, bb):
            y = x
            for _ in range(links // 2):
                y = dense_forward(y, wa, ba, impl=impl)
                y = (dense_forward(y, wb, bb, impl=impl) * 0.2
                     ).astype(jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32))
        return f

    args = [(x, wa, ba, wb, bb) for x in xs]
    timeit(f"xla    K={K} N={N}", chain("xla"), args, flops, links)
    timeit(f"pallas K={K} N={N}", chain("pallas"), args, flops, links)

    ref = dense_forward(xs[0].astype(jnp.float32), wa.astype(jnp.float32),
                        ba, impl="xla")
    y = dense_forward(xs[0], wa, ba, impl="pallas").astype(jnp.float32)
    print("  compiled rel err vs f32:",
          f"{float(jnp.abs(y - ref).max() / jnp.abs(ref).max()):.2e}",
          flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    bench_pair(768, 2304)    # fused QKV + consume-back
    bench_pair(768, 768)     # out-proj shape both ways


if __name__ == "__main__":
    main()
