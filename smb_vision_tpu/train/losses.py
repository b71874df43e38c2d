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
             events: jax.Array, eps: float = 1e-7) -> jax.Array:
    order = jnp.argsort(-durations.reshape(-1))
    return cox_ph_loss_sorted(risk_scores.reshape(-1)[order],
                              events.reshape(-1)[order], eps)
