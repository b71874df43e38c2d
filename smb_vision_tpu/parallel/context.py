"""Context (sequence) parallelism for full attention.

The reference has no sequence sharding (SURVEY §2c: "no ring attention /
Ulysses") — it survives long sequences with token dropping + flash-attn.
Here sequence parallelism is first-class for the full-res 512^2x320 config:
the token dimension is sharded over the mesh's "model" axis, each device
holds q for its shard, k/v are all-gathered over ICI (N*D at ViT scale is
tens of MB — cheap relative to N^2 compute), and the Pallas flash kernel
runs on the local q shard. Outputs stay sequence-sharded.

Two variants:
- `context_parallel_attention`: kv all-gathered over ICI (N*D at ViT
  scale is tens of MB — cheap relative to N^2 compute), one kernel call.
- `ring_attention`: kv blocks rotate via ppermute, the flash kernel runs
  per block and partials merge by logsumexp — O(N/devices) kv memory for
  configs where the gathered kv no longer fits.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
try:
    from jax import shard_map as _shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map as _shard_map


def shard_map(f, **kw):
    """shard_map with varying-manual-axes checking off: pallas_call outputs
    carry no vma metadata, which trips check_vma on TPU (jax >= 0.9)."""
    try:
        return _shard_map(f, check_vma=False, **kw)
    except TypeError:  # older jax spells it check_rep
        return _shard_map(f, check_rep=False, **kw)
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smb_vision_tpu.ops.attention import attention, attention_with_lse


def context_parallel_attention(q, k, v, *, mesh: Mesh, axis: str = "model",
                               scale: Optional[float] = None,
                               impl: str = "auto",
                               batch_axis: Optional[str] = None):
    """q, k, v: (B, N, H, D) with N sharded over `axis`. Returns (B, N, H, D)
    sequence-sharded the same way. Each per-device body runs the flash
    kernel (impl='auto' on TPU) on its local q shard against the gathered
    kv — the sequence-parallel fast path the round-1 models abandoned.

    batch_axis: mesh axis the batch dim is sharded over (usually "data"
    inside the models); None keeps the batch replicated per shard group."""

    def local(q_shard, k_shard, v_shard):
        k_full = jax.lax.all_gather(k_shard, axis, axis=1, tiled=True)
        v_full = jax.lax.all_gather(v_shard, axis, axis=1, tiled=True)
        return attention(q_shard, k_full, v_full, scale=scale, impl=impl)

    spec = P(batch_axis, axis, None, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)


def ring_attention(q, k, v, *, mesh: Mesh, axis: str = "model",
                   scale: Optional[float] = None, impl: str = "auto",
                   batch_axis: Optional[str] = None,
                   interpret: bool = False):
    """Ring attention with true O(N/devices) memory: kv shards rotate
    around the ring via ppermute and every block runs the Pallas flash
    kernel (`attention_with_lse`, impl='auto' on TPU), so no step ever
    materialises a score tensor or a gathered kv — the largest live
    arrays are one kv block and the f32 (B, N/dev, H, D) accumulator.

    Per-block normalised partials (o_i, lse2_i) merge with the exact
    log-sum-exp combine (weights exp2(lse2_i - total), log2 units —
    matching the kernel's lse output). The ring loop is unrolled over the
    static ring size: XLA overlaps each step's ppermute with the previous
    block's compute, and reverse-mode AD works through the unrolled merges
    because the flash VJP is differentiable through BOTH outputs (the lse2
    cotangent folds into the backward's delta term, ops/attention._bwd).
    Backward memory holds each step's kv block + (out, lse) partial —
    O(N) total like the gather variant, never O(N^2).

    Use `context_parallel_attention` when the gathered kv fits (one
    all-gather beats n_dev-1 ppermute latencies); use the ring when it
    does not (full-res 20480-token configs at model>=2)."""
    n_dev = mesh.shape[axis]

    def local(q_shard, k_shard, v_shard):
        def block(ks, vs):
            out, lse2 = attention_with_lse(q_shard, ks, vs, scale=scale,
                                           impl=impl, interpret=interpret)
            return out.astype(jnp.float32), lse2

        def merge(a, b):
            """Combine two normalised partials over disjoint kv blocks:
            softmax weights are w_x = exp2(lse2_x - lse2_total)."""
            out_a, lse_a = a
            out_b, lse_b = b
            m = jnp.maximum(lse_a, lse_b)
            wa = jnp.exp2(lse_a - m)
            wb = jnp.exp2(lse_b - m)
            denom = wa + wb
            # weights are (B, H, Q) -> broadcast over (B, Q, H, D)
            bw = lambda w: jnp.swapaxes(  # noqa: E731
                (w / denom)[..., None], 1, 2)
            out = out_a * bw(wa) + out_b * bw(wb)
            return out, m + jnp.log2(denom)

        acc = block(k_shard, v_shard)
        ks, vs = k_shard, v_shard
        perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
        for _ in range(n_dev - 1):
            ks = jax.lax.ppermute(ks, axis, perm)
            vs = jax.lax.ppermute(vs, axis, perm)
            acc = merge(acc, block(ks, vs))
        return acc[0].astype(q_shard.dtype)

    spec = P(batch_axis, axis, None, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)
