"""bf16 kernel deeper-unroll probe (round 3).

The round-3 int8 sweep showed u8 sub-block unroll beats the shipped u4
by ~10% (more independent qk/exp/pv chains for Mosaic to overlap —
scripts/kexp/i8v3.py). Does the same lever pay on the bf16 paths that
training rides (fwd + both bwd passes)?

Same-session A/B at the d64 flagship shape through the SHIPPED kernels
(_pick_unroll patched per variant). Timing protocol per
memory/round2-kernel-findings: 12 layer-equivalents per jit call,
distinct inputs per call, scalar readback.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import smb_vision_tpu.ops.attention as A

H, N, D = 12, 20480, 64
LAYERS = 12
SCALE = 1 / np.sqrt(D)


def mk(i):
    ks = jax.random.split(jax.random.PRNGKey(i), 3)
    return [(jax.random.normal(kk, (H, N, D)) * 0.5).astype(jnp.bfloat16)
            for kk in ks]


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    cache = {}
    orig_pick = A._pick_unroll

    def bench(tag, unroll, bq, bk, bwd=False):
        A._pick_unroll = (lambda block, i8=False: unroll)
        try:
            flops = 4 * N * N * D * H * (3.5 if bwd else 1)

            @jax.jit
            def many(q, k, v):
                out = q
                for _ in range(LAYERS):
                    out = A._flash(out, k, v, SCALE, bq, bk, False)
                return jnp.sum(out.astype(jnp.float32))

            @jax.jit
            def many_bwd(q, k, v):
                def f(q):
                    out = q
                    for _ in range(LAYERS):
                        out = A._flash(out, k, v, SCALE, bq, bk, False)
                    return jnp.sum(out.astype(jnp.float32))
                l, g = jax.value_and_grad(f)(q)
                return l + jnp.sum(g.astype(jnp.float32))

            fn = many_bwd if bwd else many

            def run(i):
                if i not in cache:
                    cache[i] = mk(i)
                return fn(*cache[i])

            try:
                float(run(0))
            except Exception as e:  # noqa: BLE001
                print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:140]}",
                      flush=True)
                return
            times = []
            for i in range(3):
                t0 = time.perf_counter()
                float(run(100 + i))
                times.append(time.perf_counter() - t0)
            t = min(times) / LAYERS
            print(f"{tag:32s}: {t*1e3:7.2f} ms/layer "
                  f"{flops/t/1e12:6.1f} TFLOP/s ({flops/t/1.97e14*100:4.1f}%"
                  " peak)", flush=True)
        finally:
            A._pick_unroll = orig_pick

    bench("fwd  u4 bq4096 bk2048 (ship)", 4, 4096, 2048)
    bench("fwd  u8 bq4096 bk2048", 8, 4096, 2048)
    bench("fwd  u8 bq5120 bk2048", 8, 5120, 2048)
    bench("f+b  u4 bq4096 bk2048 (ship)", 4, 4096, 2048, bwd=True)
    bench("f+b  u8 bq4096 bk2048", 8, 4096, 2048, bwd=True)
    bench("f+b  u8 bq2048 bk2048", 8, 2048, 2048, bwd=True)


if __name__ == "__main__":
    main()
