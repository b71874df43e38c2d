"""Validate + time the INTEGRATED fused-MLP op (ops/mlp.py) on-chip.

1. compiled numerics vs the XLA path at the flagship shape
2. chain timing of the shipped kernel (2D f-chunk grid) vs the XLA chain
   and vs the single-pass probe result (scripts/kexp/mlpk2.py: 94-95)
3. ViT-L MLP (K=1024, F=4096 -> streamed bf=2048 chunks) and the MIM
   decoder shape (K=384, F=1536)
4. bn sweep at the flagship shape
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from smb_vision_tpu.ops.mlp import _mlp_pallas, _plan, mlp_forward

LINKS = 24


def mk(seed, shape, dtype=jnp.bfloat16, s=0.5):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
            * s).astype(dtype)


def timeit(label, fn, args_list, flops, n_pass=3):
    float(fn(*args_list[0]))
    times = []
    for _ in range(n_pass):
        for args in args_list[1:]:
            t0 = time.perf_counter()
            float(fn(*args))
            times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{label:40s} {t/LINKS*1e3:8.3f} ms/link  "
          f"{flops/t/1e12:7.1f} TFLOP/s", flush=True)


def bench_shape(M, K, F, bn_override=None, plan_override=None):
    xs = [mk(i, (M, K)) for i in range(4)]
    w1, w2 = mk(97, (K, F)), mk(98, (F, K))
    b1 = mk(99, (F,), jnp.float32) * 0.1
    b2 = mk(100, (K,), jnp.float32) * 0.1
    flops = 4 * M * K * F * LINKS
    plan = plan_override or _plan(M, K, F)
    bm, bf, bn = plan
    if bn_override:
        bn = bn_override
    print(f"shape M={M} K={K} F={F} -> bm={bm} bf={bf} bn={bn}",
          flush=True)

    @jax.jit
    def xla_chain(x, w1, b1, w2, b2):
        y = x
        for _ in range(LINKS):
            y = (mlp_forward(y, w1, b1, w2, b2, impl="xla") * 0.2
                 ).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    @jax.jit
    def pl_chain(x, w1, b1, w2, b2):
        y = x
        b1r, b2r = b1.reshape(1, -1), b2.reshape(1, -1)
        for _ in range(LINKS):
            y = (_mlp_pallas(y, w1, b1r, w2, b2r, "gelu", bm, bf, bn)
                 * 0.2).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    args = [(x, w1, b1, w2, b2) for x in xs]
    timeit(f"xla    M={M} K={K} F={F}", xla_chain, args, flops)
    timeit(f"pallas M={M} K={K} F={F} bn={bn}", pl_chain, args, flops)

    # compiled numerics
    ref = mlp_forward(xs[0].astype(jnp.float32), w1.astype(jnp.float32),
                      b1, w2.astype(jnp.float32), b2, impl="xla")
    y = mlp_forward(xs[0], w1, b1, w2, b2, impl="pallas")
    rel = float(jnp.abs(y.astype(jnp.float32) - ref).max()
                / jnp.abs(ref).max())
    print(f"  compiled rel err vs f32: {rel:.2e}", flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "flagship"):
        bench_shape(20480, 768, 3072)        # flagship (bs1 row count)
        bench_shape(20480, 768, 3072, bn_override=384)
        bench_shape(20480, 768, 3072, bn_override=1536)
    if which == "swiglu":
        import jax.numpy as jnp
        from smb_vision_tpu.ops.mlp import (_swiglu_block_xla,
                                            swiglu_block_forward)
        M, K, F = 20480, 768, 2048   # DINOv2-base swiglu sizing
        x = mk(0, (M, K))
        lnw = (1.0 + mk(9, (K,), jnp.float32) * 0.1)
        lnb = mk(10, (K,), jnp.float32) * 0.1
        w_in, b_in = mk(1, (K, 2 * F)), mk(2, (2 * F,), jnp.float32) * 0.1
        w_out, b_out = mk(3, (F, K)), mk(4, (K,), jnp.float32) * 0.1
        flops = 6 * M * K * F * LINKS

        def chain(impl):
            @jax.jit
            def f(x, lnw, lnb, w_in, b_in, w_out, b_out):
                y = x
                for _ in range(LINKS):
                    y = (swiglu_block_forward(
                        y, lnw, lnb, w_in, b_in, w_out, b_out,
                        impl=impl) * 0.5).astype(jnp.bfloat16)
                return jnp.sum(y.astype(jnp.float32))
            return f

        args = [(mk(i, (M, K)), lnw, lnb, w_in, b_in, w_out, b_out)
                for i in range(4)]
        timeit("swiglu xla", chain("xla"), args, flops)
        timeit("swiglu pallas block", chain("pallas"), args, flops)
        ref = _swiglu_block_xla(x.astype(jnp.float32), lnw, lnb,
                                w_in.astype(jnp.float32), b_in,
                                w_out.astype(jnp.float32), b_out, 1e-6)
        y = swiglu_block_forward(x, lnw, lnb, w_in, b_in, w_out, b_out,
                                 impl="pallas")
        rel = float(jnp.abs(y.astype(jnp.float32) - ref).max()
                    / jnp.abs(ref).max())
        print(f"  compiled rel err vs f32: {rel:.2e}", flush=True)
    if which in ("all", "big"):
        bench_shape(9216, 1024, 4096)        # ViT-L (streamed w chunks)
        bench_shape(9216, 1024, 4096, plan_override=(256, 1024, 512))
        bench_shape(20480, 384, 1536)        # MIM decoder


if __name__ == "__main__":
    main()
