"""V-JEPA predictor d32 attention probe (round-3 VERDICT item 5).

The reference predictor is hidden 384 / 12 heads -> head_dim 32, and the
V-JEPA reference-arch MFU sits at 33.9-35.5% vs the 40% bar. Question:
how efficient is the flash kernel at d32, and would a 2-heads-per-block
packed kernel (block-diagonal operands, K=64 contraction / M=80 pv
output at 2x the MACs) win?

Break-even: packing spends 2x MACs at ~d64 shapes, so it wins iff the
d32 kernel runs below HALF the d64 rate per useful FLOP.

Measures (12 layer-equivalents per jit, distinct inputs, scalar readback):
- d32 reference predictor shape (12 heads, N=9216) fwd and fwd+bwd
- equal-FLOPs d64 control (6 heads, N=9216)
- d32 block-size sweep
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from smb_vision_tpu.ops.attention import _flash

N = 9216
LAYERS = 12


def mk(i, h, d):
    ks = jax.random.split(jax.random.PRNGKey(i), 3)
    return [(jax.random.normal(kk, (h, N, d)) * 0.5).astype(jnp.bfloat16)
            for kk in ks]


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    cache = {}

    def bench(tag, h, d, bq, bk, bwd=False):
        scale = 1 / np.sqrt(d)
        flops = 4 * N * N * d * h * (3.5 if bwd else 1)

        @jax.jit
        def many(q, k, v):
            out = q
            for _ in range(LAYERS):
                out = _flash(out, k, v, scale, bq, bk, False)
            return jnp.sum(out.astype(jnp.float32))

        @jax.jit
        def many_bwd(q, k, v):
            def f(q):
                out = q
                for _ in range(LAYERS):
                    out = _flash(out, k, v, scale, bq, bk, False)
                return jnp.sum(out.astype(jnp.float32))
            l, g = jax.value_and_grad(f)(q)
            return l + jnp.sum(g.astype(jnp.float32))

        fn = many_bwd if bwd else many

        def run(i):
            key = (i, h, d)
            if key not in cache:
                cache[key] = mk(i, h, d)
            return fn(*cache[key])

        try:
            float(run(0))
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:150]}",
                  flush=True)
            return
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            float(run(100 + i))
            times.append(time.perf_counter() - t0)
        t = min(times) / LAYERS
        print(f"{tag:34s}: {t*1e3:7.2f} ms/layer "
              f"{flops/t/1e12:6.1f} TFLOP/s ({flops/t/1.97e14*100:4.1f}% "
              "peak)", flush=True)

    # reference predictor: 12 heads x d32
    bench("d32 H12 fwd  bq4608 bk2304", 12, 32, 4608, 2304)
    bench("d32 H12 fwd  bq9216 bk4608", 12, 32, 9216, 4608)
    bench("d32 H12 fwd  bq2304 bk1152", 12, 32, 2304, 1152)
    # equal-FLOPs d64 control: 6 heads x d64
    bench("d64 H6  fwd  bq4608 bk2304", 6, 64, 4608, 2304)
    # fwd+bwd at the shipped defaults
    bench("d32 H12 f+b  bq4608 bk2304", 12, 32, 4608, 2304, bwd=True)
    bench("d64 H6  f+b  bq4608 bk2304", 6, 64, 4608, 2304, bwd=True)


if __name__ == "__main__":
    main()
