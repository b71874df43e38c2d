"""W8A8 pallas matmul, round 2: where did the int8 rate go?

w8a8_pallas.py measured the fused one-dot kernel at ~101 TFLOP/s — flat
with bf16 XLA (~97-99) and below even XLA's raw int8 dot (129), while the
attention kernel's int8 qk sub-blocks run at ~300 TFLOP/s. Hypothesis:
one monolithic (bm, K)@(K, N) dot per grid step gives Mosaic nothing to
overlap — quantize (VPU), dot (MXU) and the i32->f32 epilogue serialize,
and the (bm, 3072) i32 accumulator is 6 MB of VMEM pressure.

Variants (all chains, 50 links, distinct inputs, scalar readback):
  i8pure-u{1,4}  — x8 given, shift requant; MXU/DMA upper bound in pallas
  fused-nsplit-u4 — quantize once per row block, then 4 independent dots
                    over N quarters (shared x8, separate i32 accs)
  fused-msplit-u4 — 4 row sub-blocks, each quantize->dot (independent
                    VPU->MXU chains, the attention kernel's trick)
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


def _rowq(xf):
    amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
    sx = jnp.where(amax == 0, 1.0, amax) / 127.0
    return jnp.clip(jnp.round(xf / sx), -127, 127).astype(jnp.int8), sx


def _i8dot(x8, w8):
    return jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.int32)


def _kernel_i8pure(u, x_ref, w8_ref, o_ref):
    bm = x_ref.shape[0]
    sub = bm // u
    for i in range(u):
        acc = _i8dot(x_ref[i * sub:(i + 1) * sub], w8_ref[...])
        o_ref[i * sub:(i + 1) * sub] = (acc >> 8).astype(jnp.int8)


def _kernel_fused_nsplit(u, x_ref, w8_ref, sw_ref, o_ref):
    xf = x_ref[...].astype(jnp.float32)
    x8, sx = _rowq(xf)
    n = w8_ref.shape[1]
    sub = n // u
    for j in range(u):
        acc = _i8dot(x8, w8_ref[:, j * sub:(j + 1) * sub])
        y = acc.astype(jnp.float32) * sx * sw_ref[:, j * sub:(j + 1) * sub]
        o_ref[:, j * sub:(j + 1) * sub] = y.astype(o_ref.dtype)


def _kernel_fused_msplit(u, x_ref, w8_ref, sw_ref, o_ref):
    bm = x_ref.shape[0]
    sub = bm // u
    for i in range(u):
        xf = x_ref[i * sub:(i + 1) * sub].astype(jnp.float32)
        x8, sx = _rowq(xf)
        acc = _i8dot(x8, w8_ref[...])
        y = acc.astype(jnp.float32) * sx * sw_ref[...]
        o_ref[i * sub:(i + 1) * sub] = y.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "u"))
def i8pure_mm(x8, w8, bm=512, u=1):
    m, k = x8.shape
    n = w8.shape[1]
    return pl.pallas_call(
        functools.partial(_kernel_i8pure, u),
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), jnp.int8),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x8, w8)


@functools.partial(jax.jit, static_argnames=("bm", "u", "mode"))
def fused_mm(x, w8, sw, bm=512, u=4, mode="m"):
    m, k = x.shape
    n = w8.shape[1]
    body = _kernel_fused_msplit if mode == "m" else _kernel_fused_nsplit
    return pl.pallas_call(
        functools.partial(body, u),
        grid=(m // bm,),
        in_specs=[pl.BlockSpec((bm, k), lambda i: (i, 0)),
                  pl.BlockSpec((k, n), lambda i: (0, 0)),
                  pl.BlockSpec((1, n), lambda i: (0, 0))],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
    )(x, w8, sw)


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


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    xs = [mk(i, (N, K)) for i in range(4)]
    w1 = mk(97, (K, M))
    w2 = mk(98, (M, K))
    w18, s1 = quant_cols(w1.astype(jnp.float32))
    w28, s2 = quant_cols(w2.astype(jnp.float32))
    x8s = [jnp.clip(jnp.round(x.astype(jnp.float32) / 0.01), -127, 127
                    ).astype(jnp.int8) for x in xs]

    for u in (1, 4):
        @jax.jit
        def i8chain(x8, w18, w28, u=u):
            y = x8
            for _ in range(LINKS // 2):
                y = i8pure_mm(y, w18, u=u)
                y = i8pure_mm(y, w28, u=u)
            return jnp.sum(y.astype(jnp.int32))

        timeit(f"pallas i8pure u={u}", i8chain,
               [(x8, w18, w28) for x8 in x8s])

    for mode in ("m", "n"):
        for u in (2, 4):
            for bm in (256, 512):
                @jax.jit
                def chain(x, w18, s1, w28, s2, u=u, bm=bm, mode=mode):
                    y = x
                    for _ in range(LINKS // 2):
                        y = (fused_mm(y, w18, s1, bm=bm, u=u, mode=mode)
                             * 0.0625).astype(jnp.bfloat16)
                        y = (fused_mm(y, w28, s2, bm=bm, u=u, mode=mode)
                             * 0.0625).astype(jnp.bfloat16)
                    return jnp.sum(y.astype(jnp.float32))

                timeit(f"fused {mode}split u={u} bm={bm}", chain,
                       [(x, w18, s1, w28, s2) for x in xs])


if __name__ == "__main__":
    main()
