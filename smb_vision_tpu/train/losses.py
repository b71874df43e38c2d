"""Task losses beyond plain CE/MSE/BCE (those live with the model heads).

Cox partial-likelihood for survival fine-tuning, numerically matching the
reference (run_classification.py:39-72): sort by descending duration, then
loss = -sum((log_h - log_cumsum_exp(log_h)) * event) / (sum(event) + eps).
jit-safe: jnp.argsort replaces torch .sort(descending=True).

Note: the cumulative-sum risk set makes this a *within-batch* quantity — on
a sharded mesh, survival batches must either stay on one data shard or the
risk scores must be all-gathered before the loss (see train/classification).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cox_ph_loss_sorted(log_h: jax.Array, events: jax.Array,
                       eps: float = 1e-7) -> jax.Array:
    events = events.reshape(-1).astype(jnp.float32)
    log_h = log_h.reshape(-1).astype(jnp.float32)
    gamma = jnp.max(log_h)
    log_cumsum_h = jnp.log(jnp.cumsum(jnp.exp(log_h - gamma)) + eps) + gamma
    return -jnp.sum((log_h - log_cumsum_h) * events) / (jnp.sum(events) + eps)


def cox_loss(risk_scores: jax.Array, durations: jax.Array,
             events: jax.Array, eps: float = 1e-7,
             valid: jax.Array | None = None) -> jax.Array:
    """`valid` (optional, same length, 1=real row / 0=padding) excludes
    padded rows from BOTH sides of the partial likelihood: their events are
    zeroed (no numerator term) and their risk is driven to a large negative
    so exp() underflows to 0 in every cumulative risk set (no denominator
    term). Needed because Cox is a batch-level nonlinear loss — the
    trainer's repeat-last-row eval padding would otherwise inflate every
    sample's risk denominator (no count weighting can undo that). A finite
    sentinel (-1e30) is used instead of -inf: (-inf - logsumexp) * 0 would
    be NaN."""
    risk = risk_scores.reshape(-1).astype(jnp.float32)
    events = events.reshape(-1).astype(jnp.float32)
    if valid is not None:
        v = valid.reshape(-1).astype(jnp.float32)
        events = events * v
        risk = jnp.where(v > 0, risk, jnp.float32(-1e30))
    order = jnp.argsort(-durations.reshape(-1))
    return cox_ph_loss_sorted(risk[order], events[order], eps)
