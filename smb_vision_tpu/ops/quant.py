"""W8A8 dynamic-quantization linear for the inference fast path.

The v5e MXU runs int8 x int8 -> int32 at 2x the bf16 rate (394 vs 197
TOP/s). For forward-only embedding workloads the transformer projections
(QKV, attn out, MLP) can run there: weights are quantized per output
channel, activations per tensor with a dynamic (abs-max) scale computed
on the fly. Replaces nothing in the reference (it has no quantized
inference); this is TPU-native headroom on top of the flash kernel's
int8 score path.

Accuracy: per-channel weight + per-tensor activation symmetric
quantization is the standard W8A8 recipe; on LayerNormed ViT
activations the end-to-end embed drift is of the same order as bf16
round-off (see tests/test_attention.py::test_quant_dense and the HF
parity delta documented in BENCHMARKS.md).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def w8a8_dot(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """x @ kernel on the int8 MXU.

    x: (..., K) any float dtype; kernel: (K, M) float32.
    Returns (..., M) in x.dtype. Weights are quantized per out-channel,
    activations per tensor (dynamic abs-max). Symmetric, zero-point-free.
    """
    lead = x.shape[:-1]
    kdim = x.shape[-1]
    x2 = x.reshape(-1, kdim).astype(jnp.float32)

    sx = jnp.max(jnp.abs(x2)) / 127.0
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
