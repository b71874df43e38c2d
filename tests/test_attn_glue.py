"""Fused attention-glue kernels (ops/attn_glue.py) and their Block
wiring: pallas (interpret off-TPU) must match the plain XLA composition
for forward and gradients, and the Block param tree must be identical
between glue_impl settings (checkpoint compatibility)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smb_vision_tpu.ops.attn_glue import (
    attn_out_residual,
    qkv_ln_forward,
)


@pytest.fixture
def rng():
    return np.random.default_rng(0)


def _mk(rng, shape, scale=1.0, dt=jnp.float32):
    return jnp.asarray(rng.normal(size=shape) * scale, dt)


def test_qkv_ln_pallas_matches_xla(rng):
    K = 256
    x = _mk(rng, (2, 256, K), dt=jnp.bfloat16)
    lnw = _mk(rng, (K,), 0.1) + 1
    lnb = _mk(rng, (K,), 0.1)
    wq, wk, wv = (_mk(rng, (K, K), 0.02) for _ in range(3))
    bq, bv = (_mk(rng, (K,), 0.02) for _ in range(2))
    # bias_mode "qv": k bias is None
    outs_p = qkv_ln_forward(x, lnw, lnb, wq, bq, wk, None, wv, bv,
                            impl="pallas")
    outs_x = qkv_ln_forward(x, lnw, lnb, wq, bq, wk, None, wv, bv,
                            impl="xla")
    for a, b in zip(outs_p, outs_x):
        ref = np.asarray(b, np.float32)
        np.testing.assert_allclose(np.asarray(a, np.float32), ref,
                                   atol=2e-2 * np.abs(ref).max())


def test_qkv_ln_grads_match(rng):
    K = 128
    x = _mk(rng, (1, 128, K), dt=jnp.bfloat16)
    lnw = _mk(rng, (K,), 0.1) + 1
    lnb = _mk(rng, (K,), 0.1)
    wq, wk, wv = (_mk(rng, (K, K), 0.05) for _ in range(3))
    bq, bk, bv = (_mk(rng, (K,), 0.02) for _ in range(3))

    def loss(impl):
        def f(x, wq, lnw, bq):
            q, k, v = qkv_ln_forward(x, lnw, lnb, wq, bq, wk, bk, wv,
                                     bv, impl=impl)
            return (q.astype(jnp.float32) ** 2
                    + (k * v).astype(jnp.float32)).mean()
        return f

    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2, 3))(x, wq, lnw, bq)
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2, 3))(x, wq, lnw, bq)
    for a, b in zip(gp, gx):
        ref = np.asarray(b, np.float32)
        np.testing.assert_allclose(np.asarray(a, np.float32), ref,
                                   atol=2e-2 * max(np.abs(ref).max(), 1e-3))


def test_out_residual_pallas_matches_xla(rng):
    K = 256
    res = _mk(rng, (2, 256, K), dt=jnp.bfloat16)
    y = _mk(rng, (2, 256, K), dt=jnp.bfloat16)
    wo = _mk(rng, (K, K), 0.02)
    bo = _mk(rng, (K,), 0.02)
    ls = _mk(rng, (K,), 0.1) + 1
    a = attn_out_residual(res, y, wo, bo, layerscale=ls, impl="pallas")
    b = attn_out_residual(res, y, wo, bo, layerscale=ls, impl="xla")
    ref = np.asarray(b, np.float32)
    np.testing.assert_allclose(np.asarray(a, np.float32), ref,
                               atol=2e-2 * np.abs(ref).max())


def test_out_residual_grads(rng):
    K = 128
    res = _mk(rng, (1, 128, K), dt=jnp.bfloat16)
    y = _mk(rng, (1, 128, K), dt=jnp.bfloat16)
    wo = _mk(rng, (K, K), 0.05)
    bo = _mk(rng, (K,), 0.02)

    def loss(impl):
        return lambda res, y, wo: (attn_out_residual(
            res, y, wo, bo, impl=impl).astype(jnp.float32) ** 2).mean()

    gp = jax.grad(loss("pallas"), argnums=(0, 1, 2))(res, y, wo)
    gx = jax.grad(loss("xla"), argnums=(0, 1, 2))(res, y, wo)
    for a, b in zip(gp, gx):
        ref = np.asarray(b, np.float32)
        np.testing.assert_allclose(np.asarray(a, np.float32), ref,
                                   atol=2e-2 * max(np.abs(ref).max(), 1e-3))


def test_unmappable_shape_raises(rng):
    x = _mk(rng, (2, 100, 96), dt=jnp.bfloat16)  # K=96 not /128
    with pytest.raises(ValueError, match="cannot map"):
        qkv_ln_forward(x, jnp.ones(96), jnp.zeros(96),
                       *[jnp.zeros((96, 96))] * 3, None, None, None,
                       impl="pallas")


@pytest.mark.parametrize("layerscale", [None, 1e-5])
def test_block_glue_matches_plain(rng, layerscale):
    """Block(glue_impl='pallas') == Block(default) forward + grads, and
    the param trees are identical (same checkpoint layout)."""
    from smb_vision_tpu.models.layers import Block

    kw = dict(hidden_size=128, num_heads=2, intermediate_size=256,
              bias_mode="qv", layerscale_value=layerscale,
              dtype=jnp.bfloat16, attn_impl="xla", mlp_impl="xla")
    x = _mk(rng, (2, 128, 128), dt=jnp.bfloat16)
    plain = Block(**kw)
    fused = Block(glue_impl="pallas", **kw)
    params = plain.init(jax.random.PRNGKey(0), x)
    p2 = fused.init(jax.random.PRNGKey(0), x)
    assert (jax.tree_util.tree_structure(params)
            == jax.tree_util.tree_structure(p2))

    out_a = plain.apply(params, x)
    out_b = fused.apply(params, x)
    ref = np.asarray(out_a, np.float32)
    np.testing.assert_allclose(np.asarray(out_b, np.float32), ref,
                               atol=3e-2 * np.abs(ref).max())

    def loss(mod):
        return lambda p: (mod.apply(p, x).astype(jnp.float32) ** 2).mean()

    ga = jax.grad(loss(plain))(params)
    gb = jax.grad(loss(fused))(params)
    flat_a = jax.tree_util.tree_leaves_with_path(ga)
    flat_b = jax.tree_util.tree_leaves_with_path(gb)
    for (pa, a), (pb, b) in zip(flat_a, flat_b):
        assert pa == pb
        ref = np.asarray(b, np.float32)
        np.testing.assert_allclose(
            np.asarray(a, np.float32), ref,
            atol=3e-2 * max(np.abs(ref).max(), 1e-4),
            err_msg=str(pa))


def test_block_glue_droppath_training_falls_back(rng):
    """drop_path active in train mode cannot fold into the fused epilogue:
    the Block must route to the plain path (output differs from
    deterministic only by droppath randomness, params identical)."""
    from smb_vision_tpu.models.layers import Block

    kw = dict(hidden_size=128, num_heads=2, intermediate_size=256,
              drop_path_rate=0.5, dtype=jnp.bfloat16, attn_impl="xla",
              mlp_impl="xla", glue_impl="pallas")
    x = _mk(rng, (4, 128, 128), dt=jnp.bfloat16)
    blk = Block(**kw)
    params = blk.init(jax.random.PRNGKey(0), x)
    # train mode: needs dropout rng; must run (fallback path)
    out = blk.apply(params, x, None, False,
                    rngs={"droppath": jax.random.PRNGKey(1)})
    assert np.isfinite(np.asarray(out, np.float32)).all()


def test_model_glue_config_plumbing(rng):
    """glue_impl flows from config to the encoder blocks: a VideoMAE
    encoder forward with glue_impl='pallas' (interpret on CPU) matches
    the default within bf16 tolerance."""
    from smb_vision_tpu.models.configs import VideoMAEConfig
    from smb_vision_tpu.models.videomae import VideoMAEModel

    def enc(glue):
        # 4x4x2 = 32 tokens x batch 4 = 128 rows: kernel-mappable (the
        # forced-pallas route raises on unmappable shapes, like mlp_impl)
        cfg = VideoMAEConfig(
            image_size=64, num_frames=16, patch_size=16, tubelet_size=8,
            num_channels=1, hidden_size=128, num_hidden_layers=2,
            num_attention_heads=2, intermediate_size=256,
            dtype="bfloat16", attn_impl="xla", mlp_impl="xla",
            glue_impl=glue)
        return VideoMAEModel(cfg)

    px = _mk(rng, (4, 16, 1, 64, 64), dt=jnp.float32)
    m_a, m_b = enc("auto"), enc("pallas")
    params = jax.jit(m_a.init)(jax.random.PRNGKey(0), px)
    out_a, _ = m_a.apply(params, px)
    out_b, _ = m_b.apply(params, px)
    ref = np.asarray(out_a, np.float32)
    np.testing.assert_allclose(np.asarray(out_b, np.float32), ref,
                               atol=3e-2 * np.abs(ref).max())
