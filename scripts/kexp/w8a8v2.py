"""Can W8A8 projections actually pay on the int8 MXU? (round-3 retry)

Round-2c measured the W8A8 chain NEUTRAL (84.9 vs 84.1 TFLOP/s,
scripts/kexp/i8mm.py) and parked QuantDense as feature-only. That chain
had three self-inflicted costs this probe removes one by one:

  1. f32 intermediates  — acc.astype(f32) * scale kept y in f32, doubling
     every HBM write and read of the chain (252 MB vs 126 MB per link).
  2. per-TENSOR activation scale — a full global amax reduction over the
     (20480, K) activation is its own fused pass + a serializing scalar
     before the rescale can start.
  3. no producer fusion — quantize ran as a standalone pass instead of
     riding the epilogue of whatever produced the activation.

Variants (50-link chain, ViT-Base MLP shape 20480x768<->3072, distinct
inputs per call, scalar readback):
  bf16          — baseline chain
  i8 raw        — pre-quantized x and w, shift requant (MXU upper bound)
  w8a8 rowq     — per-ROW (per-token) dynamic quantize, bf16 y, weights
                  pre-quantized outside the jit
  w8a8 rowq+f32acc — same but keeping the (row-scale * col-scale) rescale
                  in the matmul's f32 epilogue before the bf16 cast

Accuracy: per-row activation scales are also strictly tighter than the
per-tensor scale (each token gets its own dynamic range), so this should
dominate the shipped w8a8_dot on both axes; printed at the end.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

LINKS = 50
N, K, M = 20480, 768, 3072
FLOPS = 2 * N * K * M * LINKS


def timeit(label, fn, args_list):
    float(fn(*args_list[0]))
    times = []
    for args in args_list[1:]:
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{label:26s} {t/LINKS*1e6:8.1f} us/link  "
          f"{FLOPS/t/1e12:7.1f} TFLOP/s", flush=True)
    return t


def mk(seed, shape, dtype=jnp.bfloat16):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
            * 0.5).astype(dtype)


def quant_cols(w):
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    return (jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8), s)


def rowq(y):
    """Per-row symmetric int8: y (N, K) bf16 -> x8 (N, K) int8, s (N, 1) f32."""
    yf = y.astype(jnp.float32)
    s = jnp.max(jnp.abs(yf), axis=1, keepdims=True) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    return jnp.clip(jnp.round(yf / s), -127, 127).astype(jnp.int8), s


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    xs = [mk(i, (N, K)) for i in range(4)]
    w1 = mk(97, (K, M))
    w2 = mk(98, (M, K))
    w18, s1 = quant_cols(w1.astype(jnp.float32))
    w28, s2 = quant_cols(w2.astype(jnp.float32))

    @jax.jit
    def bf16(x, w1, w2):
        y = x
        for _ in range(LINKS // 2):
            y = ((y @ w1) * 0.0625).astype(jnp.bfloat16)
            y = ((y @ w2) * 0.0625).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    timeit("bf16", bf16, [(x, w1, w2) for x in xs])

    x8s = [rowq(x)[0] for x in xs]

    @jax.jit
    def i8raw(x8, w18, w28):
        y = x8
        for _ in range(LINKS // 2):
            for w8 in (w18, w28):
                acc = jax.lax.dot_general(y, w8, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                y = (acc >> 8).astype(jnp.int8)
        return jnp.sum(acc)

    timeit("i8 raw (MXU bound)", i8raw, [(x8, w18, w28) for x8 in x8s])

    @jax.jit
    def w8a8_rowq(x, w18, s1, w28, s2):
        y = x
        for _ in range(LINKS // 2):
            for w8, sw in ((w18, s1), (w28, s2)):
                x8, sx = rowq(y)
                acc = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                y = ((acc.astype(jnp.float32) * (sx * sw)) * 0.0625
                     ).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    timeit("w8a8 per-row, bf16 y", w8a8_rowq,
           [(x, w18, s1, w28, s2) for x in xs])

    # per-tensor variant with bf16 intermediates — isolates how much of
    # round-2c's neutrality was the f32 traffic vs the global reduction
    @jax.jit
    def w8a8_tens(x, w18, s1, w28, s2):
        y = x
        for _ in range(LINKS // 2):
            for w8, sw in ((w18, s1), (w28, s2)):
                yf = y.astype(jnp.float32)
                sx = jnp.max(jnp.abs(yf)) / 127.0
                sx = jnp.where(sx == 0, 1.0, sx)
                x8 = jnp.clip(jnp.round(yf / sx), -127, 127).astype(jnp.int8)
                acc = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                y = ((acc.astype(jnp.float32) * (sx * sw)) * 0.0625
                     ).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    timeit("w8a8 per-tensor, bf16 y", w8a8_tens,
           [(x, w18, s1, w28, s2) for x in xs])

    # accuracy: per-row vs per-tensor vs bf16, one linear
    xf = xs[0].astype(jnp.float32)
    ref = xf @ w1.astype(jnp.float32)
    x8, sx = rowq(xs[0])
    y = jax.lax.dot_general(x8, w18, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * s1)
    print("rel err per-row w8a8:",
          float(jnp.abs(y - ref).max() / jnp.abs(ref).max()))
    print("rel err bf16        :",
          float(jnp.abs((xs[0] @ w1).astype(jnp.float32) - ref).max()
                / jnp.abs(ref).max()))


if __name__ == "__main__":
    main()
