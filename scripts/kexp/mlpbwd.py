"""Validate + time the pallas-backward fused MLP (ops/mlp.py
impl="pallas_bwd", round-5 VERDICT #1) on-chip.

1. compiled fwd+bwd numerics vs the XLA VJP at the flagship shape
2. chain timing of value_and_grad through 12 MLP links:
   impl="xla" (plain chain) vs impl="pallas" (kernel fwd, recompute VJP
   — the shipped round-4 path) vs impl="pallas_bwd" (kernel fwd with h
   spill + kernel backward + pure-matmul weight grads)
3. shapes: flagship ViT-Base visible-token MIM (M=28672, K=768, F=3072),
   ViT-L V-JEPA (M=9216*2, K=1024, F=4096), decoder (K=384, F=1536)

Methodology per BENCHMARKS.md: distinct random inputs per call, scalar
readback per call, 12 links per jit to amortize the ~25 ms relay floor.
fwd+bwd matmul FLOPs per link: xla/pallas recompute path 14*M*K*F
(fwd 4 + recompute 2 + bwd 8), pallas_bwd 12*M*K*F (fwd 4 + bwd 8) —
throughput reported on the common USEFUL 12*M*K*F so columns compare
wall-clock directly.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from smb_vision_tpu.ops.mlp import mlp_forward

LINKS = 6


def mk(seed, shape, dtype=jnp.bfloat16, s=0.5):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
            * s).astype(dtype)


def timeit(label, fn, args_list, flops):
    # every timed call dispatches a DISTINCT input tuple: the relay
    # memoizes identical dispatches, so re-timing the same args would
    # report cache replays (BENCHMARKS.md methodology note)
    float(fn(*args_list[0])[0])
    times = []
    for args in args_list[1:]:
        t0 = time.perf_counter()
        float(fn(*args)[0])
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{label:44s} {t/LINKS*1e3:8.3f} ms/link  "
          f"{flops/t/1e12:7.1f} TFLOP/s(useful)", flush=True)


def chain(impl):
    @jax.jit
    def run(x, w1, b1, w2, b2):
        def loss(w1, b1, w2, b2):
            y = x
            for _ in range(LINKS):
                y = (mlp_forward(y, w1, b1, w2, b2, impl=impl) * 0.2
                     ).astype(jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32))

        l, g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3))(w1, b1,
                                                              w2, b2)
        return l, g

    return run


def bench_shape(M, K, F, impls=("xla", "pallas", "pallas_bwd"),
                numerics=True):
    xs = [mk(i, (M, K)) for i in range(10)]
    w1, w2 = mk(97, (K, F)), mk(98, (F, K))
    b1 = mk(99, (F,), jnp.float32) * 0.1
    b2 = mk(100, (K,), jnp.float32) * 0.1
    flops = 12 * M * K * F * LINKS
    print(f"== shape M={M} K={K} F={F}", flush=True)
    args = [(x, w1, b1, w2, b2) for x in xs]
    for impl in impls:
        timeit(f"{impl:10s} M={M} K={K} F={F}", chain(impl), args, flops)
    if not numerics:
        return

    # compiled fwd+bwd numerics: pallas_bwd vs the xla VJP
    def gr(impl):
        def loss(x, w1, b1, w2, b2):
            y = mlp_forward(x, w1, b1, w2, b2, impl=impl)
            return jnp.sum(y.astype(jnp.float32) ** 2)
        return jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))

    g_pb = gr("pallas_bwd")(xs[0], w1, b1, w2, b2)
    g_ref = gr("xla")(xs[0], w1, b1, w2, b2)
    for gi, ri, name in zip(g_pb, g_ref,
                            ["dx", "dw1", "db1", "dw2", "db2"]):
        gi = gi.astype(jnp.float32)
        ri = ri.astype(jnp.float32)
        rel = float(jnp.abs(gi - ri).max() / (jnp.abs(ri).max() + 1e-6))
        print(f"  grad {name:4s} rel err vs xla: {rel:.2e}", flush=True)


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    # one impl per invocation keeps relay compiles small and results
    # streaming: `mlpbwd.py base xla` etc.
    impls = tuple(sys.argv[2:]) or ("xla", "pallas", "pallas_bwd")
    numerics = "numerics" in impls or len(sys.argv) <= 2
    impls = tuple(i for i in impls if i != "numerics")
    if which in ("all", "base"):
        bench_shape(28672, 768, 3072, impls, numerics)  # ViT-B, bs 4
    if which in ("all", "vitl"):
        bench_shape(18432, 1024, 4096, impls, numerics) # ViT-L V-JEPA
    if which in ("all", "dec"):
        bench_shape(20480, 384, 1536, impls, numerics)  # MIM decoder
