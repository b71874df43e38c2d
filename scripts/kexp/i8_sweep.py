"""Block/unroll sweep of the int8-score kernel at the d64 flagship shape.
12 layer-equivalents per jit call, distinct inputs, scalar readback."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from smb_vision_tpu.ops.attention import _fwd_i8

H, N, D = 12, 20480, 64
LAYERS = 12
FLOPS = 4 * N * N * D * H


def mk(i):
    ks = jax.random.split(jax.random.PRNGKey(i), 3)
    return [(jax.random.normal(kk, (H, N, D)) * 0.5).astype(jnp.bfloat16)
            for kk in ks]


def main():
    print("device:", jax.devices()[0].device_kind)
    scale = 1 / np.sqrt(D)
    cache = {}

    def bench(bq, bk, unroll):
        @jax.jit
        def many(q, k, v):
            out = q
            for _ in range(LAYERS):
                out = _fwd_i8(out, k, v, scale=scale, block_q=bq,
                              block_k=bk, unroll=unroll)
            return jnp.sum(out.astype(jnp.float32))

        def run(i):
            if i not in cache:
                cache[i] = mk(i)
            q, k, v = cache[i]
            return many(q, k, v)

        try:
            float(run(0))
        except Exception as e:  # noqa: BLE001
            print(f"bq={bq} bk={bk} u={unroll}: FAILED "
                  f"{type(e).__name__}: {str(e)[:120]}")
            return
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            float(run(100 + i))
            times.append(time.perf_counter() - t0)
        t = min(times) / LAYERS
        print(f"bq={bq:5d} bk={bk:5d} u={unroll}: {t*1e3:6.2f} ms/layer "
              f"{FLOPS/t/1e12:6.1f} TFLOP/s-equiv")

    import sys as _s
    if len(_s.argv) > 1 and _s.argv[1] == "bq":
        combos = [(4096, 2048, 4), (8192, 2048, 4), (8192, 4096, 4),
                  (20480, 2048, 4)]
    else:
        combos = [(4096, 2048, 2), (4096, 2048, 4), (4096, 4096, 2),
                  (4096, 4096, 4), (4096, 1024, 2), (2048, 2048, 2),
                  (4096, 2048, 1), (4096, 4096, 8)]
    for bq, bk, u in combos:
        bench(bq, bk, u)


if __name__ == "__main__":
    main()
