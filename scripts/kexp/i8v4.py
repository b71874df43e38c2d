"""int8 attention q-block sweep beyond bq5120: 10240 and 20480 (one q
block per head). The round-3 overlap lab saturated the KV-side levers
(u8/u16 unroll, interleave, cheap exp); the q side was left at 5120.
Bigger bq = fewer, larger grid steps: the per-sub-block exp/pv work per
step doubles, giving Mosaic more independent in-step work, at the cost
of cross-step pipelining. Chain protocol: 12 layer-equivalents/jit,
distinct inputs, scalar readback, min over passes."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from smb_vision_tpu.ops.attention import attention

B, H, N, D = 1, 12, 20480, 64
LAYERS = 12
FLOPS = 4 * B * H * N * N * D * LAYERS


def mk(seed):
    return (jax.random.normal(jax.random.PRNGKey(seed),
                              (B, N, H, D), jnp.float32) * 0.5
            ).astype(jnp.bfloat16)


def timeit(label, fn, inputs, n_pass=3):
    float(fn(*inputs[0]))
    times = []
    for _ in range(n_pass):
        for args in inputs[1:]:
            t0 = time.perf_counter()
            float(fn(*args))
            times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{label:34s} {t/LAYERS*1e3:8.3f} ms/layer  "
          f"{FLOPS/t/1e12:7.1f} TFLOP/s-equiv", flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    inputs = [(mk(3 * i), mk(3 * i + 1), mk(3 * i + 2)) for i in range(4)]

    for bq in (5120, 10240, 20480):
        for bk in (2048, 4096):
            def chain(q, k, v, bq=bq, bk=bk):
                y = q
                for _ in range(LAYERS):
                    y = attention(y, k, v, impl="pallas_int8",
                                  block_q=bq, block_k=bk)
                return jnp.sum(y.astype(jnp.float32))

            try:
                timeit(f"int8 bq={bq} bk={bk}", jax.jit(chain), inputs)
            except Exception as e:  # noqa: BLE001
                print(f"int8 bq={bq} bk={bk} FAILED: "
                      f"{type(e).__name__}: {str(e)[:140]}", flush=True)

    # bf16 control at the winner-candidate blocks
    for bq in (4096, 10240):
        def chain(q, k, v, bq=bq):
            y = q
            for _ in range(LAYERS):
                y = attention(y, k, v, impl="pallas", block_q=bq)
            return jnp.sum(y.astype(jnp.float32))

        try:
            timeit(f"bf16 bq={bq}", jax.jit(chain), inputs)
        except Exception as e:  # noqa: BLE001
            print(f"bf16 bq={bq} FAILED: {type(e).__name__}: "
                  f"{str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
