"""Context (sequence) parallelism for full attention.

The reference has no sequence sharding (SURVEY §2c: "no ring attention /
Ulysses") — it survives long sequences with token dropping + flash-attn.
Here sequence parallelism is first-class for the full-res 512^2x320 config:
the token dimension is sharded over the mesh's "model" axis, each device
holds q for its shard, k/v are all-gathered over ICI (N*D at ViT scale is
tens of MB — cheap relative to N^2 compute), and the Pallas flash kernel
runs on the local q shard. Outputs stay sequence-sharded.

This is the non-causal equivalent of ring attention's first step; a
streaming ring (kv ppermute with online softmax merge) drops the memory
from O(N) gathered kv to O(N/devices) and is the planned follow-up for
configs where gathered kv no longer fits.
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

from smb_vision_tpu.ops.attention import attention


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
                   scale: Optional[float] = None,
                   batch_axis: Optional[str] = None):
    """Ring attention: kv shards rotate around the ring via ppermute while
    each device accumulates its q-shard's online softmax. Memory stays
    O(N/devices) per device; compute overlaps communication step-to-step.

    Numerically merges per-shard (out, lse) pairs with the standard
    log-sum-exp combine. Uses the XLA attention for per-block compute with
    explicit lse (the Pallas kernel's lse output is reused when available).
    """
    import math

    if scale is None:
        scale = 1.0 / math.sqrt(q.shape[-1])
    n_dev = mesh.shape[axis]

    def local(q_shard, k_shard, v_shard):
        def block_attn(qs, ks, vs):
            """Per-block *normalised* attention + its logsumexp:
            o = softmax(s) v over this kv block, lse = logsumexp(s)."""
            s = jnp.einsum("bqhd,bkhd->bhqk", qs, ks,
                           preferred_element_type=jnp.float32) * scale
            m = jnp.max(s, axis=-1, keepdims=True)
            p = jnp.exp(s - m)
            l = jnp.sum(p, axis=-1, keepdims=True)
            out = jnp.einsum("bhqk,bkhd->bqhd", (p / l).astype(vs.dtype), vs)
            lse = (m + jnp.log(l))[..., 0]            # (B, H, Q)
            return out.astype(jnp.float32), lse

        def merge(a, b):
            """Combine two normalised partials: softmax weights are
            w_x = exp(lse_x - lse_total)."""
            out_a, lse_a = a
            out_b, lse_b = b
            m = jnp.maximum(lse_a, lse_b)
            wa = jnp.exp(lse_a - m)
            wb = jnp.exp(lse_b - m)
            denom = wa + wb
            # weights are (B, H, Q) -> broadcast over (B, Q, H, D)
            bw = lambda w: jnp.swapaxes(  # noqa: E731
                (w / denom)[..., None], 1, 2)
            out = out_a * bw(wa) + out_b * bw(wb)
            return out, m + jnp.log(denom)

        acc = block_attn(q_shard, k_shard, v_shard)

        def step(_, carry):
            acc, (ks, vs) = carry
            perm = [(j, (j + 1) % n_dev) for j in range(n_dev)]
            ks = jax.lax.ppermute(ks, axis, perm)
            vs = jax.lax.ppermute(vs, axis, perm)
            return merge(acc, block_attn(q_shard, ks, vs)), (ks, vs)

        (out, _), _ = jax.lax.fori_loop(
            0, n_dev - 1, step, (acc, (k_shard, v_shard)))
        return out.astype(q_shard.dtype)

    spec = P(batch_axis, axis, None, None)
    return shard_map(local, mesh=mesh, in_specs=(spec, spec, spec),
                     out_specs=spec)(q, k, v)
