"""Does XLA lower int8 dot_general to the v5e's 2x int8 MXU path?

Chained matmuls (each depends on the previous — no CSE, no linear
strength-reduction) at the ViT-Base projection shape, 50 links per jit
call to swamp the ~25 ms relay floor. Distinct inputs per call, scalar
readback.
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
    float(fn(*args_list[0]))  # compile + warm
    times = []
    for args in args_list[1:]:
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{label:28s} {t/LINKS*1e6:8.1f} us/link  "
          f"{FLOPS/t/1e12:7.1f} TFLOP/s")
    return t


def mk(seed, shape, dtype=jnp.bfloat16):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
            * 0.5).astype(dtype)


def main():
    print("device:", jax.devices()[0].device_kind)
    xs = [mk(i, (N, K)) for i in range(4)]
    w1 = mk(97, (K, M))
    w2 = mk(98, (M, K))

    @jax.jit
    def bf16(x, w1, w2):
        y = x
        for i in range(LINKS // 2):
            y = ((y @ w1) * 0.0625).astype(jnp.bfloat16)
            y = ((y @ w2) * 0.0625).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    timeit("bf16 chain", bf16, [(x, w1, w2) for x in xs])

    def quant(v, axis=None):
        s = jnp.max(jnp.abs(v), axis=axis, keepdims=axis is not None) / 127.0
        s = jnp.where(s == 0, 1.0, s)
        return (jnp.clip(jnp.round(v / s), -127, 127).astype(jnp.int8), s)

    w1f = w1.astype(jnp.float32)
    w2f = w2.astype(jnp.float32)
    w18, s1 = quant(w1f, axis=0)
    w28, s2 = quant(w2f, axis=0)

    @jax.jit
    def w8a8(x, w18, s1, w28, s2):
        y = x.astype(jnp.float32)
        for i in range(LINKS // 2):
            for w8, sw in ((w18, s1), (w28, s2)):
                x8, sx = quant(y)
                acc = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                y = acc.astype(jnp.float32) * (sx * sw)
        return jnp.sum(y)

    timeit("w8a8 dyn-quant chain", w8a8,
           [(x, w18, s1, w28, s2) for x in xs])

    # raw int8 matmul chain (requant via cheap shift, no f32 pass) — upper
    # bound on the int8 MXU rate itself
    x8s = [quant(x.astype(jnp.float32))[0] for x in xs]

    @jax.jit
    def i8raw(x8, w18, w28):
        y = x8
        for i in range(LINKS // 2):
            for w8 in (w18, w28):
                acc = jax.lax.dot_general(y, w8, (((1,), (0,)), ((), ())),
                                          preferred_element_type=jnp.int32)
                y = (acc >> 8).astype(jnp.int8)
        return jnp.sum(acc)

    timeit("int8 raw chain", i8raw, [(x8, w18, w28) for x8 in x8s])

    # accuracy of one w8a8 linear vs f32
    xf = xs[0].astype(jnp.float32)
    ref = xf @ w1f
    x8, sx = quant(xf)
    y = jax.lax.dot_general(x8, w18, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * s1)
    rel = float(jnp.abs(y - ref).max() / jnp.abs(ref).max())
    print(f"w8a8 rel err vs f32: {rel:.5f}")
    relb = float(jnp.abs((xs[0] @ w1).astype(jnp.float32) - ref).max()
                 / jnp.abs(ref).max())
    print(f"bf16 rel err vs f32: {relb:.5f}")


if __name__ == "__main__":
    main()
