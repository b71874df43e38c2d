"""Pallas W8A8 matmul: fused per-row activation quantize + int8 MXU.

XLA's int8 dot_general measured 115 TFLOP/s (29% of the v5e's 394 TOP/s
int8 peak) in round-2c (scripts/kexp/i8mm.py), and the separate dynamic-
quantize pass ate even that. This kernel fuses the activation quantize
into the matmul so x is read ONCE from HBM as bf16 and never round-trips
as int8:

  grid = (M // bm,)              one grid step per row block
  x_ref   (bm, K)  bf16         per-step DMA
  w8_ref  (K, N)   int8         grid-invariant -> VMEM-resident
  sw_ref  (1, N)   f32          per-out-channel weight scales
  out_ref (bm, N)  bf16

  in-kernel: row amax -> per-row scale -> int8 cast -> dot(int8, int8,
  preferred int32) -> f32 * (sx_row * sw_col) -> bf16 store.

One-shot N works for every projection in the stack (N <= 3072 = 2.4 MB
int8 weights, well under the ~16 MB VMEM budget); K spans 768/3072.

Chain protocol as i8mm.py: 50 links, distinct inputs, scalar readback.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LINKS = 50
N, K, M = 20480, 768, 3072
FLOPS = 2 * N * K * M * LINKS


def _kernel(x_ref, w8_ref, sw_ref, o_ref):
    xf = x_ref[...].astype(jnp.float32)                  # (bm, K)
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)   # (bm, 1)
    sx = jnp.where(amax == 0, 1.0, amax) / 127.0
    x8 = jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8)
    acc = jax.lax.dot_general(x8, w8_ref[...], (((1,), (0,)), ((), ())),
                              preferred_element_type=jnp.int32)
    y = acc.astype(jnp.float32) * sx * sw_ref[...]
    o_ref[...] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "interpret"))
def w8a8_mm(x, w8, sw, bm=512, interpret=False):
    m, k = x.shape
    n = w8.shape[1]
    return pl.pallas_call(
        _kernel,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, w8, sw)


def timeit(label, fn, args_list):
    float(fn(*args_list[0]))
    times = []
    for args in args_list[1:]:
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{label:30s} {t/LINKS*1e6:8.1f} us/link  "
          f"{FLOPS/t/1e12:7.1f} TFLOP/s", flush=True)
    return t


def mk(seed, shape, dtype=jnp.bfloat16):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
            * 0.5).astype(dtype)


def quant_cols(w):
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    return (jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8), s)


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

    timeit("bf16 XLA", bf16, [(x, w1, w2) for x in xs])

    for bm in (256, 512, 1024):
        @functools.partial(jax.jit, static_argnames=())
        def chain(x, w18, s1, w28, s2, bm=bm):
            y = x
            for _ in range(LINKS // 2):
                y = (w8a8_mm(y, w18, s1, bm=bm) * 0.0625
                     ).astype(jnp.bfloat16)
                y = (w8a8_mm(y, w28, s2, bm=bm) * 0.0625
                     ).astype(jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32))

        timeit(f"pallas w8a8 bm={bm}", chain,
               [(x, w18, s1, w28, s2) for x in xs])

    # accuracy vs f32 and vs the shipped per-tensor w8a8_dot
    from smb_vision_tpu.ops.quant import w8a8_dot
    xf = xs[0].astype(jnp.float32)
    ref = xf @ w1.astype(jnp.float32)
    y = w8a8_mm(xs[0], w18, s1).astype(jnp.float32)
    print("rel err pallas per-row :",
          float(jnp.abs(y - ref).max() / jnp.abs(ref).max()))
    yt = w8a8_dot(xs[0], w1.astype(jnp.float32)).astype(jnp.float32)
    print("rel err shipped tensor :",
          float(jnp.abs(yt - ref).max() / jnp.abs(ref).max()))
    print("rel err bf16           :",
          float(jnp.abs((xs[0] @ w1).astype(jnp.float32) - ref).max()
                / jnp.abs(ref).max()))


if __name__ == "__main__":
    main()
