"""SPMD partitioning of the pallas-backed ops (ops/partition.py).

A bare pallas_call has no GSPMD rule: under pjit with sharded operands
XLA inserts all-gathers and computes the kernel REPLICATED on every
device — which would silently turn multi-chip dp/fsdp into every-chip-
computes-the-full-batch. These tests pin the fix: the kernels must
compile with ZERO all-gathers for batch-sharded inputs, keep the
sharding on their outputs/grads, and match the replicated numerics.
(Kernels run in interpret mode on the CPU mesh.)"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from smb_vision_tpu.ops.attention import attention
from smb_vision_tpu.ops.mlp import mlp_forward


@pytest.fixture(scope="module")
def mesh():
    return Mesh(np.array(jax.devices()).reshape(-1), ("data",))


def _mk(seed, shape, s=0.5):
    return jax.random.normal(jax.random.PRNGKey(seed), shape,
                             jnp.float32) * s


def test_mlp_kernel_partitions_rowwise(mesh):
    M, K, F = 2048, 256, 1024
    x = _mk(0, (M, K)).astype(jnp.bfloat16)
    w1, b1 = _mk(1, (K, F)), _mk(2, (F,)) * 0.1
    w2, b2 = _mk(3, (F, K)), _mk(4, (K,)) * 0.1
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))

    f = jax.jit(lambda x, *a: mlp_forward(x, *a, impl="pallas",
                                          interpret=True))
    hlo = f.lower(xs, w1, b1, w2, b2).compile().as_text()
    assert hlo.count("all-gather") == 0
    y = f(xs, w1, b1, w2, b2)
    assert y.sharding.spec[0] == "data"
    ref = f(x, w1, b1, w2, b2)
    assert jnp.array_equal(y, ref)


def test_attention_partitions_batchwise_fwd_bwd(mesh):
    B, N, H, D = 8, 256, 2, 64
    q, k, v = (_mk(i, (B, N, H, D)) for i in range(3))
    sh = NamedSharding(mesh, P("data", None, None, None))
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))

    def loss(q, k, v):
        out = attention(q, k, v, impl="pallas", interpret=True)
        return jnp.sum(out.astype(jnp.float32) ** 2)

    f = jax.jit(jax.value_and_grad(loss, argnums=(0, 1, 2)))
    hlo = f.lower(qs, ks, vs).compile().as_text()
    assert hlo.count("all-gather") == 0
    _, grads = f(qs, ks, vs)
    _, grads_r = f(q, k, v)
    for g, gr in zip(grads, grads_r):
        assert g.sharding.spec[0] == "data"
        assert jnp.array_equal(g, gr)


def test_attention_int8_partitions_batchwise(mesh):
    B, N, H, D = 8, 256, 2, 64
    q, k, v = (_mk(i, (B, N, H, D)) for i in range(3))
    sh = NamedSharding(mesh, P("data", None, None, None))
    qs, ks, vs = (jax.device_put(a, sh) for a in (q, k, v))

    f = jax.jit(lambda q, k, v: attention(q, k, v, impl="pallas_int8",
                                          interpret=True))
    hlo = f.lower(qs, ks, vs).compile().as_text()
    assert hlo.count("all-gather") == 0
    y = f(qs, ks, vs)
    assert y.sharding.spec[0] == "data"
    # per-head int8 scales are computed per shard from the same rows ->
    # identical to the replicated run
    assert jnp.array_equal(y, f(q, k, v))


def test_mlp_partitioned_grads_match(mesh):
    M, K, F = 1024, 256, 512
    x = _mk(0, (M, K)).astype(jnp.bfloat16)
    w1, b1 = _mk(1, (K, F)), _mk(2, (F,)) * 0.1
    w2, b2 = _mk(3, (F, K)), _mk(4, (K,)) * 0.1
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))

    def loss(x, w1, b1, w2, b2):
        y = mlp_forward(x, w1, b1, w2, b2, impl="pallas", interpret=True)
        return jnp.sum(y.astype(jnp.float32) ** 2)

    g = jax.jit(jax.grad(loss, argnums=(0, 1, 2, 3, 4)))
    gs = g(xs, w1, b1, w2, b2)
    gr = g(x, w1, b1, w2, b2)
    assert gs[0].sharding.spec[0] == "data"
    for a, b in zip(gs, gr):
        # weight/bias grads contract over the SHARDED row dim: per-shard
        # partials round to bf16 before the all-reduce, so values drift
        # up to ~1% of scale vs the one-device f32 accumulation. The
        # test guards against wrong-shard garbage, not bit parity.
        np.testing.assert_allclose(
            np.asarray(a, np.float32), np.asarray(b, np.float32),
            rtol=0, atol=2e-2 * float(jnp.abs(b).max() + 1e-6))


def test_mlp_keeps_megatron_tp_split(mesh):
    """Megatron-TP weights (fc1 column-split / fc2 row-split over the
    mesh axis) must KEEP their split through the fused MLP: each shard
    computes its F chunk and one all-reduce merges partials — the
    kernel must not force weight replication (which would multiply MLP
    FLOPs by the model-axis size)."""
    M, K, F = 1024, 256, 1024
    x = _mk(0, (M, K)).astype(jnp.bfloat16)
    w1, b1 = _mk(1, (K, F)), _mk(2, (F,)) * 0.1
    w2, b2 = _mk(3, (F, K)), _mk(4, (K,)) * 0.1
    w1s = jax.device_put(w1, NamedSharding(mesh, P(None, "data")))
    b1s = jax.device_put(b1, NamedSharding(mesh, P("data")))
    w2s = jax.device_put(w2, NamedSharding(mesh, P("data", None)))

    f = jax.jit(lambda x, *a: mlp_forward(x, *a, impl="pallas",
                                          interpret=True))
    hlo = f.lower(x, w1s, b1s, w2s, b2).compile().as_text()
    assert hlo.count("all-gather") == 0, "TP split was replicated"
    assert hlo.count("all-reduce") >= 1, "missing partial-sum combine"
    y = f(x, w1s, b1s, w2s, b2)
    ref = mlp_forward(x, w1, b1, w2, b2, impl="pallas", interpret=True)
    scale = float(jnp.abs(ref.astype(jnp.float32)).max())
    assert float(jnp.abs(y.astype(jnp.float32)
                         - ref.astype(jnp.float32)).max()) / scale < 1e-2


def test_mlp_block_keeps_megatron_tp_split(mesh):
    from smb_vision_tpu.ops.mlp import mlp_block_forward

    M, K, F = 1024, 256, 1024
    x = _mk(0, (M, K)).astype(jnp.bfloat16)
    lnw, lnb = 1.0 + _mk(9, (K,)) * 0.1, _mk(10, (K,)) * 0.1
    w1, b1 = _mk(1, (K, F)), _mk(2, (F,)) * 0.1
    w2, b2 = _mk(3, (F, K)), _mk(4, (K,)) * 0.1
    w1s = jax.device_put(w1, NamedSharding(mesh, P(None, "data")))
    b1s = jax.device_put(b1, NamedSharding(mesh, P("data")))
    w2s = jax.device_put(w2, NamedSharding(mesh, P("data", None)))

    f = jax.jit(lambda x, lnw, lnb, *a: mlp_block_forward(
        x, lnw, lnb, *a, impl="pallas", interpret=True))
    hlo = f.lower(x, lnw, lnb, w1s, b1s, w2s, b2).compile().as_text()
    assert hlo.count("all-gather") == 0, "TP split was replicated"
    assert hlo.count("all-reduce") >= 1, "missing partial-sum combine"
    y = f(x, lnw, lnb, w1s, b1s, w2s, b2)
    ref = mlp_block_forward(x, lnw, lnb, w1, b1, w2, b2, impl="pallas",
                            interpret=True)
    scale = float(jnp.abs(ref.astype(jnp.float32)).max())
    assert float(jnp.abs(y.astype(jnp.float32)
                         - ref.astype(jnp.float32)).max()) / scale < 1e-2


def test_mlp_unmappable_shard_falls_back_per_shard(mesh):
    """Round-4 adversarial review (VERDICT #9): a globally-mappable row
    count whose PER-SHARD slice does not map onto the kernel (1536/8 =
    192 rows, not a 128-multiple) must stay partitioned — the wrapped
    local fn falls back to the XLA chain per shard (ops/mlp.py
    _padded_plan -> None) with ZERO all-gathers and XLA-class numerics,
    never a replicated gather or a crash."""
    M, K, F = 1536, 256, 512
    x = _mk(0, (M, K)).astype(jnp.bfloat16)
    w1, b1 = _mk(1, (K, F)), _mk(2, (F,)) * 0.1
    w2, b2 = _mk(3, (F, K)), _mk(4, (K,)) * 0.1
    xs = jax.device_put(x, NamedSharding(mesh, P("data", None)))

    f = jax.jit(lambda x, *a: mlp_forward(x, *a, impl="pallas",
                                          interpret=True))
    hlo = f.lower(xs, w1, b1, w2, b2).compile().as_text()
    assert hlo.count("all-gather") == 0
    y = f(xs, w1, b1, w2, b2)
    assert y.sharding.spec[0] == "data"
    ref = jax.jit(lambda x, *a: mlp_forward(x, *a, impl="xla"))(
        x, w1, b1, w2, b2)
    # per-shard XLA fallback == the XLA chain, up to bf16 reduction order
    np.testing.assert_allclose(
        np.asarray(y, np.float32), np.asarray(ref, np.float32),
        rtol=0.05, atol=0.5)
