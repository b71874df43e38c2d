"""Pipeline-parallel model application: run a trained checkpoint's
transformer stack through the GPipe schedule (parallel/pipeline.py)
without changing the parameter layout.

The reference scales depth only by replicating every layer on every GPU
(DeepSpeed ZeRO); here a model too large for one chip's HBM splits its
layer stack over a mesh "pipe" axis and streams microbatches through the
stage ring. Params stay in the HF-compatible per-layer dict layout on
host — `stack_layer_params` builds the stacked (pipe-sharded) view at
dispatch, so the same checkpoint serves dense, sequence-parallel, and
pipelined execution.

Inference/embedding path (deterministic=True): DropPath is identity, so
the per-layer stochastic-depth rates need no threading. Training through
the pipeline works at the `pipeline_apply` level (see
tests/test_pipeline.py) but per-layer drop-path schedules are not
representable in the stacked layout — `pipelined_encoder` rejects
non-deterministic calls when drop_path_rate > 0.
"""

from __future__ import annotations

from typing import Any, Optional

import flax.linen as nn
import jax.numpy as jnp
from jax.sharding import Mesh

from smb_vision_tpu.models.layers import Block, Encoder
from smb_vision_tpu.ops.patches import patch_embed, sincos_position_table
from smb_vision_tpu.ops.rope3d import rope3d_cos_sin
from smb_vision_tpu.parallel.pipeline import pipeline_apply, stack_layer_params


def pipelined_encoder(enc: Encoder, enc_params: dict, x, *, mesh: Mesh,
                      axis: str = "pipe", num_microbatches: int,
                      rope: Any = None, batch_axis: Optional[str] = None,
                      remat: bool = False,
                      deterministic: bool = True):
    """Apply an `Encoder` stack (its `{"layer_i": ...}` params) through the
    pipeline. Equivalent to `enc.apply({"params": enc_params}, x, rope,
    deterministic)` for the dense (non-sequence-parallel) configuration —
    asserted by tests/test_pipelined_models.py."""
    if not deterministic and enc.drop_path_rate > 0:
        raise ValueError(
            "pipelined_encoder supports deterministic application only "
            "when drop_path_rate > 0: per-layer stochastic-depth rates "
            "are static module fields, not stackable params")
    if enc.sequence_parallel:
        raise ValueError(
            "pipelined_encoder runs blocks inside shard_map; build the "
            "Encoder with sequence_parallel=False (pipe composes with "
            "the data axis, not the sequence axis)")
    stacked, n = stack_layer_params(enc_params)
    if n != enc.num_layers:
        raise ValueError(f"params carry {n} layers, Encoder declares "
                         f"{enc.num_layers}")
    block = Block(enc.hidden_size, enc.num_heads, enc.intermediate_size,
                  act=enc.act, bias_mode=enc.bias_mode,
                  layer_norm_eps=enc.layer_norm_eps,
                  layerscale_value=enc.layerscale_value,
                  use_swiglu=enc.use_swiglu, dtype=enc.dtype,
                  attn_impl=enc.attn_impl,
                  initializer_range=enc.initializer_range,
                  quant8=enc.quant8)

    if rope is None:
        layer_fn = lambda p, h: block.apply(  # noqa: E731
            {"params": p}, h, None, deterministic)
        return pipeline_apply(layer_fn, stacked, x, mesh=mesh, axis=axis,
                              num_microbatches=num_microbatches,
                              batch_axis=batch_axis, remat=remat)
    layer_fn = lambda p, h, rp: block.apply(  # noqa: E731
        {"params": p}, h, rp, deterministic)
    return pipeline_apply(layer_fn, stacked, x, mesh=mesh, axis=axis,
                          num_microbatches=num_microbatches,
                          batch_axis=batch_axis, remat=remat, extra=rope)


def videomae_pipeline_encode(config, params: dict, pixel_values, *,
                             mesh: Mesh, axis: str = "pipe",
                             num_microbatches: int,
                             batch_axis: Optional[str] = None,
                             remat: bool = False):
    """VideoMAEModel embedding forward (unmasked path, videomae.py:86-105)
    with the transformer stack pipelined: patch embed + sincos positions
    compute replicated (a fraction of one layer's FLOPs), the 12/24-layer
    stack streams through the pipe stages, final LayerNorm if the config
    keeps one. Matches `VideoMAEModel.apply(params, px)[0]`."""
    cfg = config
    p = params.get("params", params)
    dt = jnp.dtype(cfg.dtype) if isinstance(cfg.dtype, str) else cfg.dtype
    x = patch_embed(pixel_values, p["patch_embed_kernel"],
                    p["patch_embed_bias"], dtype=dt)
    x = x + sincos_position_table(cfg.seq_len, cfg.hidden_size).astype(dt)
    enc = Encoder(
        num_layers=cfg.num_hidden_layers, hidden_size=cfg.hidden_size,
        num_heads=cfg.num_attention_heads,
        intermediate_size=cfg.intermediate_size, act=cfg.hidden_act,
        bias_mode="qv" if cfg.qkv_bias else "none",
        layer_norm_eps=cfg.layer_norm_eps, dtype=dt,
        attn_impl=cfg.attn_impl, initializer_range=cfg.initializer_range,
        quant8=cfg.quant8)
    x = pipelined_encoder(enc, p["encoder"], x, mesh=mesh, axis=axis,
                          num_microbatches=num_microbatches,
                          batch_axis=batch_axis, remat=remat)
    if not cfg.use_mean_pooling:
        ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                          param_dtype=jnp.float32)
        x = ln.apply({"params": p["layernorm"]}, x)
    return x


def vjepa2_pipeline_encode(config, params: dict, pixel_values_videos, *,
                           mesh: Mesh, axis: str = "pipe",
                           num_microbatches: int,
                           batch_axis: Optional[str] = None,
                           remat: bool = False):
    """VJEPA2Encoder forward (vjepa.py:48-83) with the stack pipelined;
    the shared 3D-RoPE tables ship to every stage as the pipeline's
    layer-invariant extra operand. Matches `VJEPA2Encoder.apply`."""
    cfg = config
    p = params.get("params", params)
    dt = jnp.dtype(cfg.dtype)
    x = patch_embed(pixel_values_videos, p["patch_embed_kernel"],
                    p["patch_embed_bias"], dtype=dt)
    n = x.shape[1]
    rope = rope3d_cos_sin(jnp.arange(n), cfg.crop_size // cfg.patch_size,
                          cfg.head_dim, dtype=dt)
    enc = Encoder(
        num_layers=cfg.num_hidden_layers, hidden_size=cfg.hidden_size,
        num_heads=cfg.num_attention_heads,
        intermediate_size=int(cfg.hidden_size * cfg.mlp_ratio),
        act=cfg.hidden_act, bias_mode="qkv" if cfg.qkv_bias else "none",
        layer_norm_eps=cfg.layer_norm_eps, dtype=dt,
        attn_impl=cfg.attn_impl, initializer_range=cfg.initializer_range)
    x = pipelined_encoder(enc, p["encoder"], x, mesh=mesh, axis=axis,
                          num_microbatches=num_microbatches, rope=rope,
                          batch_axis=batch_axis, remat=remat)
    ln = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=dt,
                      param_dtype=jnp.float32)
    return ln.apply({"params": p["layernorm"]}, x)
