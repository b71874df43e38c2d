"""8-bit optimizer state: the TPU-native analog of bitsandbytes Adam8bit
(the reference's optional optimizer, /root/reference/src/train/trainer.py:
155-167 — the one §2b component with no round-1 equivalent).

`adamw8bit` is a drop-in optax GradientTransformation whose first/second
moments are stored as int8 codes with per-block float32 scales (block 256),
cutting optimizer-state memory ~3.6x vs f32 Adam. Design choices:

- signed cubic blockwise quantization for the first moment
  (code = 127*cbrt(m/blockmax)): most mass in Adam's mu sits far below the
  block max, and the cubic map concentrates code resolution near zero the
  way bnb's dynamic map does, without a lookup table the VPU would hate
- the second moment is quantized on a sqrt scale (nonnegative, huge
  dynamic range)
- moments are dequantized, updated in f32, and requantized every step —
  all static-shape elementwise ops that XLA fuses around the matmul-free
  update
- weight decay / LR schedule / masking compose exactly as with
  optax.adamw (decoupled decay applied on the update like AdamW)

Convergence parity with exact AdamW is asserted in
tests/test_train.py::test_adamw8bit_tracks_exact_adamw.
"""

from __future__ import annotations

from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

_BLOCK = 256


class _Quantized(NamedTuple):
    codes: jax.Array     # int8, padded flat (nb, block)
    scales: jax.Array    # f32 (nb, 1)


def _blocks(x: jax.Array, block: int) -> jax.Array:
    flat = x.reshape(-1).astype(jnp.float32)
    pad = (-flat.shape[0]) % block
    if pad:
        flat = jnp.pad(flat, (0, pad))
    return flat.reshape(-1, block)


def _unblocks(blocks: jax.Array, shape) -> jax.Array:
    n = 1
    for s in shape:
        n *= s
    return blocks.reshape(-1)[:n].reshape(shape)


def _quantize(x: jax.Array, block: int = _BLOCK,
              mapping: str = "cubic") -> _Quantized:
    b = _blocks(x, block)
    scale = jnp.max(jnp.abs(b), axis=1, keepdims=True)
    safe = jnp.where(scale == 0.0, 1.0, scale)
    norm = b / safe                                    # [-1, 1]
    if mapping == "cubic":
        norm = jnp.cbrt(norm)
    codes = jnp.clip(jnp.round(norm * 127.0), -127, 127).astype(jnp.int8)
    return _Quantized(codes, scale)


def _dequantize(q: _Quantized, shape, mapping: str = "cubic") -> jax.Array:
    norm = q.codes.astype(jnp.float32) / 127.0
    if mapping == "cubic":
        norm = norm ** 3
    return _unblocks(norm * q.scales, shape)


class Adam8bitState(NamedTuple):
    count: jax.Array
    mu: optax.Params      # pytree of _Quantized
    nu: optax.Params      # pytree of _Quantized (sqrt-scale)


def scale_by_adam8bit(b1: float = 0.9, b2: float = 0.999,
                      eps: float = 1e-8,
                      block: int = _BLOCK) -> optax.GradientTransformation:
    """Adam moment tracking with int8 blockwise-quantized state."""

    def init(params):
        mu = jax.tree_util.tree_map(
            lambda p: _quantize(jnp.zeros_like(p, jnp.float32), block),
            params)
        nu = jax.tree_util.tree_map(
            lambda p: _quantize(jnp.zeros_like(p, jnp.float32), block),
            params)
        return Adam8bitState(jnp.zeros([], jnp.int32), mu, nu)

    def update(updates, state, params=None):
        del params
        count = state.count + 1

        def moment(g, q, decay, power):
            m = _dequantize(q, g.shape)
            m = decay * m + (1 - decay) * (g.astype(jnp.float32) ** power)
            return m

        mus = jax.tree_util.tree_map(
            lambda g, q: moment(g, q, b1, 1), updates, state.mu,
            is_leaf=lambda x: isinstance(x, _Quantized))
        # nu stored as sqrt(nu): dequant -> square -> update -> sqrt -> quant
        nus = jax.tree_util.tree_map(
            lambda g, q: b2 * _dequantize(q, g.shape) ** 2
            + (1 - b2) * g.astype(jnp.float32) ** 2,
            updates, state.nu,
            is_leaf=lambda x: isinstance(x, _Quantized))

        bc1 = 1 - b1 ** count.astype(jnp.float32)
        bc2 = 1 - b2 ** count.astype(jnp.float32)
        out = jax.tree_util.tree_map(
            lambda m, v: (m / bc1) / (jnp.sqrt(v / bc2) + eps), mus, nus)
        new_mu = jax.tree_util.tree_map(lambda m: _quantize(m, block), mus)
        new_nu = jax.tree_util.tree_map(
            lambda v: _quantize(jnp.sqrt(v), block), nus)
        return out, Adam8bitState(count, new_mu, new_nu)

    return optax.GradientTransformation(init, update)


def adamw8bit(learning_rate, b1: float = 0.9, b2: float = 0.999,
              eps: float = 1e-8, weight_decay: float = 0.0,
              mask=None, block: int = _BLOCK
              ) -> optax.GradientTransformation:
    """AdamW with 8-bit moment state (bnb Adam8bit analog)."""
    tx = [scale_by_adam8bit(b1=b1, b2=b2, eps=eps, block=block)]
    if weight_decay:
        tx.append(optax.add_decayed_weights(weight_decay, mask=mask))
    tx.append(optax.scale_by_learning_rate(learning_rate))
    return optax.chain(*tx)
