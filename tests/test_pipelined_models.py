"""Model-level pipeline parallelism: whole-checkpoint embedding forwards
(VideoMAE, VJEPA2 with RoPE) through the GPipe pipeline match the dense
model application bit-for-bit at f32 tolerances."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

from smb_vision_tpu.models.configs import VideoMAEConfig, VJEPA2Config
from smb_vision_tpu.models.pipelined import (
    pipelined_encoder,
    videomae_pipeline_encode,
    vjepa2_pipeline_encode,
)
from smb_vision_tpu.models.videomae import VideoMAEModel
from smb_vision_tpu.models.vjepa import VJEPA2Encoder

KEY = jax.random.PRNGKey(0)


def test_videomae_pipeline_encode_matches_dense(eight_devices):
    cfg = VideoMAEConfig(
        image_size=32, num_frames=16, patch_size=8, tubelet_size=8,
        num_channels=1, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, intermediate_size=128,
        dtype="float32", attn_impl="xla")
    model = VideoMAEModel(cfg)
    px = jax.random.normal(KEY, (4, 16, 1, 32, 32))
    params = model.init(KEY, px)
    ref, _ = model.apply(params, px)

    mesh = Mesh(np.array(eight_devices).reshape(2, 4), ("data", "pipe"))
    out = jax.jit(lambda p, x: videomae_pipeline_encode(
        cfg, p, x, mesh=mesh, num_microbatches=2,
        batch_axis="data"))(params, px)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_vjepa2_pipeline_encode_matches_dense(eight_devices):
    cfg = VJEPA2Config(
        crop_size=32, frames_per_clip=16, patch_size=8, tubelet_size=8,
        in_chans=1, hidden_size=64, num_hidden_layers=4,
        num_attention_heads=4, mlp_ratio=2.0,
        pred_hidden_size=32, pred_num_hidden_layers=1,
        pred_num_attention_heads=2, dtype="float32", attn_impl="xla")
    model = VJEPA2Encoder(cfg)
    px = jax.random.normal(KEY, (2, 16, 1, 32, 32))
    params = model.init(KEY, px)
    ref = model.apply(params, px)

    mesh = Mesh(np.array(eight_devices[:4]), ("pipe",))
    out = jax.jit(lambda p, x: vjepa2_pipeline_encode(
        cfg, p, x, mesh=mesh, num_microbatches=2))(params, px)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)


def test_pipelined_encoder_guards(eight_devices):
    from smb_vision_tpu.models.layers import Encoder

    mesh = Mesh(np.array(eight_devices[:2]), ("pipe",))
    x = jax.random.normal(KEY, (2, 8, 16))
    enc_dp = Encoder(num_layers=2, hidden_size=16, num_heads=2,
                     intermediate_size=32, dtype=jnp.float32,
                     attn_impl="xla", drop_path_rate=0.1)
    params = enc_dp.init(KEY, x)["params"]
    with pytest.raises(ValueError, match="deterministic"):
        pipelined_encoder(enc_dp, params, x, mesh=mesh,
                          num_microbatches=2, deterministic=False)
    enc_sp = Encoder(num_layers=2, hidden_size=16, num_heads=2,
                     intermediate_size=32, dtype=jnp.float32,
                     attn_impl="xla", sequence_parallel=True)
    with pytest.raises(ValueError, match="sequence_parallel"):
        pipelined_encoder(enc_sp, params, x, mesh=mesh,
                          num_microbatches=2)


def test_pipelined_encoder_layerscale_swiglu(eight_devices):
    """DINOv2-style blocks (LayerScale + SwiGLU) through the pipeline:
    the stacked layout must carry every per-layer param kind."""
    from smb_vision_tpu.models.layers import Encoder

    enc = Encoder(num_layers=4, hidden_size=32, num_heads=4,
                  intermediate_size=48, layerscale_value=1e-5,
                  use_swiglu=True, dtype=jnp.float32, attn_impl="xla")
    x = jax.random.normal(KEY, (2, 8, 32))
    params = enc.init(KEY, x)
    ref = enc.apply(params, x)
    mesh = Mesh(np.array(eight_devices[:4]), ("pipe",))
    out = jax.jit(lambda p, h: pipelined_encoder(
        enc, p["params"], h, mesh=mesh, num_microbatches=2))(params, x)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=2e-5, atol=2e-5)
