"""Pipeline parallelism (GPipe over a "pipe" mesh axis): outputs and
gradients match the sequential layer chain, composed with data
parallelism, on the virtual 8-device CPU mesh."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from smb_vision_tpu.models.layers import Block, Encoder
from smb_vision_tpu.parallel.pipeline import (
    pipeline_apply,
    stack_layer_params,
    unstack_layer_params,
)

KEY = jax.random.PRNGKey(0)
HID, HEADS, INTER, LAYERS = 32, 4, 64, 4


def _encoder_and_stacked(dtype="float32"):
    enc = Encoder(num_layers=LAYERS, hidden_size=HID, num_heads=HEADS,
                  intermediate_size=INTER, dtype=jnp.dtype(dtype),
                  attn_impl="xla")
    x = jax.random.normal(KEY, (4, 16, HID))
    params = enc.init(KEY, x)
    stacked, n = stack_layer_params(params["params"])
    assert n == LAYERS
    block = Block(HID, HEADS, INTER, dtype=jnp.dtype(dtype),
                  attn_impl="xla")
    layer_fn = lambda p, h: block.apply({"params": p}, h, None, True)  # noqa: E731
    return enc, params, stacked, layer_fn, x


def test_stack_roundtrip():
    _, params, stacked, _, _ = _encoder_and_stacked()
    back = unstack_layer_params(stacked, LAYERS)
    for k, tree in params["params"].items():
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(a, b),
            tree, back[k])


@pytest.mark.parametrize("microbatches", [1, 2, 4])
def test_pipeline_matches_sequential(eight_devices, microbatches):
    enc, params, stacked, layer_fn, x = _encoder_and_stacked()
    ref = enc.apply(params, x)
    mesh = Mesh(np.array(eight_devices[:4]), ("pipe",))
    out = jax.jit(lambda s, x: pipeline_apply(
        layer_fn, s, x, mesh=mesh, axis="pipe",
        num_microbatches=microbatches))(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_grads_match_sequential(eight_devices):
    enc, params, stacked, layer_fn, x = _encoder_and_stacked()
    mesh = Mesh(np.array(eight_devices[:4]), ("pipe",))
    tgt = jax.random.normal(jax.random.PRNGKey(1), x.shape)

    def loss_seq(p):
        return jnp.mean((enc.apply({"params": p}, x) - tgt) ** 2)

    def loss_pipe(s):
        y = pipeline_apply(layer_fn, s, x, mesh=mesh, axis="pipe",
                           num_microbatches=2)
        return jnp.mean((y - tgt) ** 2)

    g_seq, _ = stack_layer_params(jax.grad(loss_seq)(params["params"]))
    g_pipe = jax.jit(jax.grad(loss_pipe))(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=5e-4, atol=1e-6),
        g_seq, g_pipe)


def test_pipeline_composes_with_data_parallel(eight_devices):
    enc, params, stacked, layer_fn, x = _encoder_and_stacked()
    ref = enc.apply(params, x)
    mesh = Mesh(np.array(eight_devices).reshape(2, 4), ("data", "pipe"))
    out = jax.jit(lambda s, x: pipeline_apply(
        layer_fn, s, x, mesh=mesh, axis="pipe", num_microbatches=2,
        batch_axis="data"))(stacked, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipeline_remat_matches(eight_devices):
    enc, params, stacked, layer_fn, x = _encoder_and_stacked()
    mesh = Mesh(np.array(eight_devices[:2]), ("pipe",))

    def loss(s, remat):
        y = pipeline_apply(layer_fn, s, x, mesh=mesh, axis="pipe",
                           num_microbatches=2, remat=remat)
        return jnp.mean(y ** 2)

    g_plain = jax.jit(jax.grad(lambda s: loss(s, False)))(stacked)
    g_remat = jax.jit(jax.grad(lambda s: loss(s, True)))(stacked)
    jax.tree_util.tree_map(
        lambda a, b: np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-8),
        g_plain, g_remat)


def test_pipeline_rejects_bad_factorings(eight_devices):
    _, _, stacked, layer_fn, x = _encoder_and_stacked()
    mesh3 = Mesh(np.array(eight_devices[:3]), ("pipe",))
    with pytest.raises(ValueError, match="pipe stages"):
        pipeline_apply(layer_fn, stacked, x, mesh=mesh3, axis="pipe",
                       num_microbatches=2)
    mesh2 = Mesh(np.array(eight_devices[:2]), ("pipe",))
    with pytest.raises(ValueError, match="microbatches"):
        pipeline_apply(layer_fn, stacked, x, mesh=mesh2, axis="pipe",
                       num_microbatches=3)
