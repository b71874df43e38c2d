"""Round-3 int8 kernel block/unroll sweep through the SHIPPED _fwd_i8.

i8v2.py findings (same session): explicit round-robin interleave loses
(11.4 vs 11.0), poly-exp2 and Schraudolph-exp lose big (18.6 / 15.0 vs
11.0 — the bitcast int ops displace Mosaic's scheduling; the hw exp2 is
already overlapped), but u8 beat u4 by 3.3% (10.63 vs 10.99). This sweep
runs the REAL kernel (ops/attention._fwd_i8) over (block_q, block_k,
unroll) to find the shipping default, plus the bf16 kernel at u8 for the
same question there.

Protocol: 12 layer-equivalents per jit, distinct inputs per call, scalar
readback (memory/round2-kernel-findings).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from smb_vision_tpu.ops.attention import _flash, _fwd_i8

H, N, D = 12, 20480, 64
LAYERS = 12
FLOPS = 4 * N * N * D * H


def mk(i):
    ks = jax.random.split(jax.random.PRNGKey(i), 3)
    return [(jax.random.normal(kk, (H, N, D)) * 0.5).astype(jnp.bfloat16)
            for kk in ks]


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    scale = 1 / np.sqrt(D)
    cache = {}

    def bench(tag, fn):
        def run(i):
            if i not in cache:
                cache[i] = mk(i)
            return fn(*cache[i])

        try:
            float(run(0))
        except Exception as e:  # noqa: BLE001
            print(f"{tag}: FAILED {type(e).__name__}: {str(e)[:120]}",
                  flush=True)
            return
        times = []
        for i in range(3):
            t0 = time.perf_counter()
            float(run(100 + i))
            times.append(time.perf_counter() - t0)
        t = min(times) / LAYERS
        print(f"{tag:28s}: {t*1e3:6.2f} ms/layer "
              f"{FLOPS/t/1e12:6.1f} TFLOP/s-equiv", flush=True)

    def i8(bq, bk, u):
        @jax.jit
        def many(q, k, v):
            out = q
            for _ in range(LAYERS):
                out = _fwd_i8(out, k, v, scale=scale, block_q=bq,
                              block_k=bk, unroll=u)
            return jnp.sum(out.astype(jnp.float32))
        return many

    def bf16(bq, bk):
        @jax.jit
        def many(q, k, v):
            out = q
            for _ in range(LAYERS):
                out = _flash(out, k, v, scale, bq, bk, False)
            return jnp.sum(out.astype(jnp.float32))
        return many

    bench("i8 bq4096 bk2048 u4 (ship)", i8(4096, 2048, 4))
    bench("i8 bq4096 bk2048 u8", i8(4096, 2048, 8))
    bench("i8 bq4096 bk4096 u8", i8(4096, 4096, 8))
    bench("i8 bq4096 bk4096 u16", i8(4096, 4096, 16))
    bench("i8 bq5120 bk2048 u8", i8(5120, 2048, 8))
    bench("i8 bq5120 bk4096 u8", i8(5120, 4096, 8))
    bench("i8 bq2048 bk2048 u8", i8(2048, 2048, 8))
    bench("bf16 bq4096 bk2048 (ship)", bf16(4096, 2048))


if __name__ == "__main__":
    main()
