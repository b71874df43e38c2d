"""W8A8 dynamic-quantization linear for the inference fast path.

The v5e MXU's int8 path is nominally 2x bf16 (394 vs 197 TOP/s); measured
through this toolchain it tops out near 132 TFLOP/s at the ViT projection
shapes (scripts/kexp/w8a8_pallas2.py: pure pre-quantized int8 pallas
matmul 132.6, XLA int8 dot 129.4, vs 96-99 for the bf16 XLA chain).
Round-2c's per-TENSOR dynamic quantize with f32 intermediates ate all of
that (neutral, scripts/kexp/i8mm.py). Round 3 re-measured the recipe
space (scripts/kexp/w8a8v2.py, w8a8_pallas.py, w8a8_pallas2.py):

- per-ROW (per-token) activation scales + bf16 intermediates: 103.5
  TFLOP/s vs 96.6 bf16 same-session (+7%) — shipped below.
- pallas fused quantize+matmul (one-shot N, m/n sub-block unrolls,
  bm 256-1024): 87-102 TFLOP/s — never beats the XLA row-quantize
  version; the int8 MXU rate at K=768/3072 is the binding ceiling, not
  the quantize pass. Negative result; kernels kept as probe scripts.

Per-row scales are also strictly tighter than per-tensor (each token gets
its own dynamic range), so this dominates the round-2 recipe on both
axes. Replaces nothing in the reference (it has no quantized inference);
this is TPU-native headroom on top of the flash kernel's int8 score path.

Accuracy: per-channel weight + per-row activation symmetric quantization;
on LayerNormed ViT activations the end-to-end embed drift is of the same
order as bf16 round-off (tests/test_attention.py::test_quant_dense; task-
level bound in BENCHMARKS.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def w8a8_dot(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """x @ kernel on the int8 MXU.

    x: (..., K) any float dtype; kernel: (K, M) float32.
    Returns (..., M) in x.dtype. Weights are quantized per out-channel,
    activations per row (per token) with dynamic abs-max scales.
    Symmetric, zero-point-free.
    """
    lead = x.shape[:-1]
    kdim = x.shape[-1]
    x2 = x.reshape(-1, kdim).astype(jnp.float32)

    sx = jnp.max(jnp.abs(x2), axis=1, keepdims=True) / 127.0   # (rows, 1)
    sx = jnp.where(sx == 0, 1.0, sx)
    x8 = jnp.clip(jnp.round(x2 / sx), -127, 127).astype(jnp.int8)

    kf = kernel.astype(jnp.float32)
    sw = jnp.max(jnp.abs(kf), axis=0, keepdims=True) / 127.0   # (1, M)
    sw = jnp.where(sw == 0, 1.0, sw)
    w8 = jnp.clip(jnp.round(kf / sw), -127, 127).astype(jnp.int8)

    y = jax.lax.dot_general(x8, w8, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.int32)
    y = y.astype(jnp.float32) * (sx * sw)
    return y.reshape(*lead, kernel.shape[1]).astype(x.dtype)
