"""W8A8 inside the fused MLP kernel: does the int8 MXU pay when the
activation quantize rides VMEM-resident data?

Context: XLA-level W8A8 loses in-model (fusion breakage, w8a8v2 lab);
the pallas fused-quantize single matmul measured 87-102 vs XLA's 103
(w8a8_pallas). Here the baseline is OUR bf16 fused MLP (92-95) and the
quantize is amortized: x quantizes once per row block (scratch), h
re-quantizes per sub-block with its own row scale (legal: the second
matmul contracts only within the sub-block, so acc += i32(h8 @ w2_8)
* (sh_j * sw2)).

Variants at the flagship shape (M=20480, K=768, F=3072):
  A. shipped bf16 fused kernel (control)
  B. int8 fc1 only: x8 @ w1_8 (2x MXU on half the FLOPs), h stays bf16
  C. int8 both: + per-sub-block h quantize, h8 @ w2_8
Weights pre-quantized per-column outside (as W8A8 inference would).
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from smb_vision_tpu.ops.mlp import _gelu_as, _mlp_pallas

LINKS = 24
M, K, F = 20480, 768, 3072
FLOPS = 4 * M * K * F * LINKS


def _i8_kernel(x_ref, w18_ref, sw1_ref, b1_ref, w2a_ref, sw2_ref,
               b2_ref, o_ref, x8_scr, sx_scr, acc_scr, *, bn: int,
               both: bool):
    jf = pl.program_id(1)
    nf = pl.num_programs(1)

    @pl.when(jf == 0)
    def _init():
        xf = x_ref[...].astype(jnp.float32)
        amax = jnp.max(jnp.abs(xf), axis=1, keepdims=True)
        sx = jnp.where(amax == 0, 1.0, amax) / 127.0
        x8_scr[...] = jnp.clip(jnp.round(xf / sx), -127,
                               127).astype(jnp.int8)
        sx_scr[...] = jnp.broadcast_to(sx, sx_scr.shape)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    x8 = x8_scr[...]
    sx = sx_scr[:, :1]
    acc = acc_scr[...]
    for j in range(w18_ref.shape[1] // bn):
        sl = slice(j * bn, (j + 1) * bn)
        hi = jax.lax.dot_general(x8, w18_ref[:, sl],
                                 (((1,), (0,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        h = hi.astype(jnp.float32) * (sx * sw1_ref[0, sl]) \
            + b1_ref[0, sl]
        h = _gelu_as(h)
        if both:
            hmax = jnp.max(jnp.abs(h), axis=1, keepdims=True)
            sh = jnp.where(hmax == 0, 1.0, hmax) / 127.0
            h8 = jnp.clip(jnp.round(h / sh), -127, 127).astype(jnp.int8)
            gi = jax.lax.dot_general(h8, w2a_ref[sl, :],
                                     (((1,), (0,)), ((), ())),
                                     preferred_element_type=jnp.int32)
            acc = acc + gi.astype(jnp.float32) * (sh * sw2_ref[...])
        else:
            acc = acc + jax.lax.dot_general(
                h.astype(jnp.bfloat16), w2a_ref[sl, :],
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
    acc_scr[...] = acc

    @pl.when(jf == nf - 1)
    def _flush():
        o_ref[...] = (acc_scr[...] + b2_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "both"))
def i8_mlp(x, w18, sw1, b1, w2a, sw2, b2, bm=512, bn=768, both=False):
    m, k = x.shape
    f = w18.shape[1]
    return pl.pallas_call(
        functools.partial(_i8_kernel, bn=bn, both=both),
        grid=(m // bm, 1),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, jf: (i, 0)),
            pl.BlockSpec((k, f), lambda i, jf: (0, 0)),
            pl.BlockSpec((1, f), lambda i, jf: (0, 0)),
            pl.BlockSpec((1, f), lambda i, jf: (0, 0)),
            pl.BlockSpec((f, k), lambda i, jf: (0, 0)),
            pl.BlockSpec((1, k), lambda i, jf: (0, 0)),
            pl.BlockSpec((1, k), lambda i, jf: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, k), lambda i, jf: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.int8),
                        pltpu.VMEM((bm, 128), jnp.float32),
                        pltpu.VMEM((bm, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
    )(x, w18, sw1, b1, w2a, sw2, b2)


def mk(seed, shape, dtype=jnp.bfloat16, s=0.5):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
            * s).astype(dtype)


def quant_cols(w):
    s = jnp.max(jnp.abs(w), axis=0, keepdims=True) / 127.0
    s = jnp.where(s == 0, 1.0, s)
    return (jnp.clip(jnp.round(w / s), -127, 127).astype(jnp.int8), s)


def timeit(label, fn, args_list, n_pass=3):
    float(fn(*args_list[0]))
    times = []
    for _ in range(n_pass):
        for args in args_list[1:]:
            t0 = time.perf_counter()
            float(fn(*args))
            times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{label:34s} {t/LINKS*1e3:8.3f} ms/link  "
          f"{FLOPS/t/1e12:7.1f} TFLOP/s", flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    xs = [mk(i, (M, K)) for i in range(4)]
    w1, w2 = mk(97, (K, F)), mk(98, (F, K))
    b1 = mk(99, (1, F), jnp.float32) * 0.1
    b2 = mk(100, (1, K), jnp.float32) * 0.1
    w18, sw1 = quant_cols(w1.astype(jnp.float32))
    w28, sw2 = quant_cols(w2.astype(jnp.float32))

    @jax.jit
    def bf16_chain(x, w1, b1, w2, b2):
        y = x
        for _ in range(LINKS):
            y = (_mlp_pallas(y, w1, b1, w2, b2, "gelu", 512, F, 768)
                 * 0.2).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    timeit("bf16 fused kernel (control)", bf16_chain,
           [(x, w1, b1, w2, b2) for x in xs])

    # B: int8 fc1 only (w2 in bf16 via the same operand slot)
    @jax.jit
    def b_chain(x, w18, sw1, b1, w2, sw2, b2):
        y = x
        for _ in range(LINKS):
            y = (i8_mlp(y, w18, sw1, b1, w2, sw2, b2, both=False) * 0.2
                 ).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    try:
        timeit("int8 fc1 (W8A8 first matmul)", b_chain,
               [(x, w18, sw1, b1, w2, sw2, b2) for x in xs])
    except Exception as e:  # noqa: BLE001
        print("int8 fc1 FAILED:", type(e).__name__, str(e)[:160],
              flush=True)

    # C: int8 both matmuls
    @jax.jit
    def c_chain(x, w18, sw1, b1, w28, sw2, b2):
        y = x
        for _ in range(LINKS):
            y = (i8_mlp(y, w18, sw1, b1, w28, sw2, b2, both=True) * 0.2
                 ).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    try:
        timeit("int8 both (W8A8 full MLP)", c_chain,
               [(x, w18, sw1, b1, w28, sw2, b2) for x in xs])
    except Exception as e:  # noqa: BLE001
        print("int8 both FAILED:", type(e).__name__, str(e)[:160],
              flush=True)

    # accuracy
    xf = xs[0].astype(jnp.float32)
    ref = _gelu_as(xf @ w1.astype(jnp.float32) + b1) @ w2.astype(
        jnp.float32) + b2
    scale = float(jnp.abs(ref).max())
    for both, tag in ((False, "fc1"), (True, "both")):
        try:
            w2x = w28 if both else w2
            y = i8_mlp(xs[0], w18, sw1, b1, w2x, sw2, b2,
                       both=both).astype(jnp.float32)  # noqa: F841
            print(f"rel err int8[{tag}]: "
                  f"{float(jnp.abs(y - ref).max()) / scale:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"acc int8[{tag}] FAILED: {str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
