"""Unroll sweep for the bf16 fwd kernel at the d64 flagship shape (the
int8 kernel gained 12% from u4 in a same-session A/B — test bf16)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from smb_vision_tpu.ops.attention import _fwd

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
                out, _l = _fwd(out, k, v, scale=scale, block_q=bq,
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
                  f"{type(e).__name__}: {str(e)[:100]}")
            return
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            float(run(100 + i))
            times.append(time.perf_counter() - t0)
        t = min(times) / LAYERS
        print(f"bq={bq:5d} bk={bk:5d} u={unroll}: {t*1e3:6.2f} ms/layer "
              f"{FLOPS/t/1e12:6.1f} TFLOP/s")

    for bq, bk, u in [(4096, 2048, 2), (4096, 2048, 4), (4096, 4096, 4),
                      (4096, 2048, 8)]:
        bench(bq, bk, u)


if __name__ == "__main__":
    main()
