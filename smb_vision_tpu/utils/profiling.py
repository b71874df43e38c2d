"""Profiling and performance accounting.

The reference has no first-party tracing (SURVEY §5); here it is
first-class: jax.profiler trace capture around chosen train steps, plus
analytic FLOPs models for MFU reporting in the Trainer.
"""

from __future__ import annotations

import contextlib
from typing import Optional


@contextlib.contextmanager
def trace(log_dir: str, enabled: bool = True):
    """Capture a jax.profiler trace (view with xprof/tensorboard)."""
    import jax

    if not enabled:
        yield
        return
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def transformer_flops(seq_len: int, hidden: int, layers: int,
                      intermediate: Optional[int] = None,
                      fwd_only: bool = False) -> float:
    """Forward FLOPs of a standard pre-LN transformer stack on `seq_len`
    tokens: qkv/proj (8*N*D^2) + attention (4*N^2*D) + mlp (4*N*D*I),
    per layer. Training (fwd+bwd) multiplies by 3."""
    intermediate = intermediate or 4 * hidden
    per_layer = (8 * seq_len * hidden * hidden
                 + 4 * seq_len * seq_len * hidden
                 + 4 * seq_len * hidden * intermediate)
    total = per_layer * layers
    return total if fwd_only else 3 * total


def mim_flops_per_sample(config, mask_ratio: float) -> float:
    """Train-step FLOPs per sample for VideoMAEForPreTraining: encoder on
    visible tokens + decoder on the full sequence."""
    n = config.seq_len
    n_vis = int(n * (1 - mask_ratio))
    enc = transformer_flops(n_vis, config.hidden_size,
                            config.num_hidden_layers,
                            config.intermediate_size)
    dec = transformer_flops(n, config.decoder_hidden_size,
                            config.decoder_num_hidden_layers,
                            config.decoder_intermediate_size)
    embed = 3 * 2 * n * config.patch_dim * config.hidden_size
    return enc + dec + embed


def vjepa_flops_per_sample(config) -> float:
    """Train-step FLOPs per sample for V-JEPA: student encoder (fwd+bwd) +
    teacher encoder (fwd only) + predictor (fwd+bwd)."""
    n = config.seq_len
    student = transformer_flops(n, config.hidden_size,
                                config.num_hidden_layers,
                                int(config.hidden_size * config.mlp_ratio))
    teacher = transformer_flops(n, config.hidden_size,
                                config.num_hidden_layers,
                                int(config.hidden_size * config.mlp_ratio),
                                fwd_only=True)
    pred = transformer_flops(n, config.pred_hidden_size,
                             config.pred_num_hidden_layers,
                             int(config.pred_hidden_size
                                 * config.pred_mlp_ratio))
    return student + teacher + pred


def encoder_flops_per_sample(config) -> float:
    """Inference (fwd-only) FLOPs for the bare encoder."""
    inter = getattr(config, "intermediate_size", None)
    if inter is None:
        # mlp_ratio configs (VJEPA2/DINOv2) size the MLP from the ratio —
        # a flat 4x fallback would misreport MFU by up to ~20%. DINOv2
        # SwiGLU uses its 2/3-rounded sizing rule (models/dinov2.py)
        ratio = getattr(config, "mlp_ratio", 4)
        if getattr(config, "use_swiglu_ffn", False):
            inter = (int(config.hidden_size * ratio * 2 / 3) + 7) // 8 * 8
        else:
            inter = int(config.hidden_size * ratio)
    return transformer_flops(config.seq_len, config.hidden_size,
                             config.num_hidden_layers, inter,
                             fwd_only=True)
