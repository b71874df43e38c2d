"""Golden-numerics parity against the actual HuggingFace torch
implementations (the reference's models are vendored HF VideoMAE / VJEPA2 —
matching HF numerics IS matching the reference).

HF weights -> our params via models/convert.py, identical inputs, outputs
compared to f32 tolerance. This is evidence the checkpoint converters and
every layer's math (qv-bias trick, sincos positions, 3D RoPE quirk,
pre-LN blocks) line up exactly."""

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from smb_vision_tpu.models.convert import (
    convert_hf_videomae,
    convert_hf_vjepa2,
)

TOL = dict(atol=2e-4, rtol=2e-4)


def _hf_state_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def videomae_pair():
    from transformers import VideoMAEConfig as HFConfig
    from transformers import VideoMAEModel as HFModel

    from smb_vision_tpu.models.configs import VideoMAEConfig
    from smb_vision_tpu.models.videomae import VideoMAEModel

    kw = dict(image_size=32, patch_size=8, num_channels=1, num_frames=16,
              tubelet_size=8, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=2, intermediate_size=64)
    hf = HFModel(HFConfig(use_mean_pooling=True, **kw)).eval()
    ours_cfg = VideoMAEConfig(use_mean_pooling=True, dtype="float32",
                              attn_impl="xla", **kw)
    ours = VideoMAEModel(ours_cfg)
    converted = convert_hf_videomae(_hf_state_numpy(hf), num_layers=2)
    # bare-encoder namespace: strip the videomae wrapper
    from smb_vision_tpu.utils.serialization import (
        flatten_params,
        unflatten_params,
    )

    flat = flatten_params(converted)
    params = unflatten_params({k.replace("params.videomae.", "params."): v
                               for k, v in flat.items()})
    return hf, ours, params, ours_cfg


def test_videomae_encoder_matches_hf(videomae_pair):
    hf, ours, params, cfg = videomae_pair
    x = torch.randn(2, 16, 1, 32, 32)
    with torch.no_grad():
        ref = hf(x).last_hidden_state.numpy()
    out, _ = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


def test_videomae_masked_encoder_matches_hf(videomae_pair):
    hf, ours, params, cfg = videomae_pair
    x = torch.randn(1, 16, 1, 32, 32)
    n = cfg.seq_len
    mask = np.zeros(n, bool)
    mask[np.arange(0, n, 2)] = True       # 50% masked, static count
    with torch.no_grad():
        ref = hf(x, bool_masked_pos=torch.tensor(mask)[None]
                 ).last_hidden_state.numpy()
    out, _ = ours.apply(params, jnp.asarray(x.numpy()),
                        jnp.asarray(mask)[None], int(mask.sum()))
    np.testing.assert_allclose(np.asarray(out), ref, **TOL)


@pytest.fixture(scope="module")
def vjepa_pair():
    from transformers import VJEPA2Config as HFConfig
    from transformers import VJEPA2Model as HFModel

    from smb_vision_tpu.models.configs import VJEPA2Config
    from smb_vision_tpu.models.vjepa import VJEPA2Model

    kw = dict(patch_size=8, crop_size=32, frames_per_clip=16, tubelet_size=8,
              in_chans=1, hidden_size=48, num_attention_heads=2,
              num_hidden_layers=2, pred_hidden_size=24,
              pred_num_attention_heads=2, pred_num_hidden_layers=2,
              pred_num_mask_tokens=4)
    hf = HFModel(HFConfig(**kw)).eval()
    ours_cfg = VJEPA2Config(dtype="float32", attn_impl="xla", **kw)
    ours = VJEPA2Model(ours_cfg)
    params = convert_hf_vjepa2(_hf_state_numpy(hf), num_layers=2,
                               pred_layers=2)
    return hf, ours, params, ours_cfg


def test_vjepa2_encoder_matches_hf(vjepa_pair):
    hf, ours, params, cfg = vjepa_pair
    x = torch.randn(2, 16, 1, 32, 32)
    with torch.no_grad():
        ref = hf(pixel_values_videos=x).last_hidden_state.numpy()
    out = ours.apply(params, jnp.asarray(x.numpy()), skip_predictor=True)
    np.testing.assert_allclose(np.asarray(out["last_hidden_state"]), ref,
                               **TOL)


def test_vjepa2_predictor_matches_hf(vjepa_pair):
    hf, ours, params, cfg = vjepa_pair
    x = torch.randn(1, 16, 1, 32, 32)
    n = cfg.seq_len
    ctx_idx = np.arange(0, n, 2)
    tgt_idx = np.arange(1, n, 2)
    with torch.no_grad():
        ref = hf(pixel_values_videos=x,
                 context_mask=[torch.tensor(ctx_idx)[None]],
                 target_mask=[torch.tensor(tgt_idx)[None]])
    out = ours.apply(params, jnp.asarray(x.numpy()),
                     context_mask=[jnp.asarray(ctx_idx)[None]],
                     target_mask=[jnp.asarray(tgt_idx)[None]])
    np.testing.assert_allclose(
        np.asarray(out["predictor_output"]),
        ref.predictor_output.last_hidden_state.numpy(), **TOL)
    np.testing.assert_allclose(
        np.asarray(out["masked_hidden_state"]),
        ref.masked_hidden_state.numpy(), **TOL)

def test_videomae_pretraining_loss_matches_hf():
    """Full pretraining objective: encoder -> enc2dec -> mask-token decoder
    -> per-patch-normalised masked MSE, vs HF torch with converted weights
    and the identical mask."""
    from transformers import VideoMAEConfig as HFConfig
    from transformers import VideoMAEForPreTraining as HFModel

    from smb_vision_tpu.models.configs import VideoMAEConfig
    from smb_vision_tpu.models.videomae import VideoMAEForPreTraining

    kw = dict(image_size=32, patch_size=8, num_channels=1, num_frames=16,
              tubelet_size=8, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=2, intermediate_size=64)
    dec = dict(decoder_hidden_size=24, decoder_num_hidden_layers=1,
               decoder_num_attention_heads=2, decoder_intermediate_size=48)
    hf = HFModel(HFConfig(norm_pix_loss=True, **kw, **dec)).eval()
    ours_cfg = VideoMAEConfig(norm_pix_loss=True, dtype="float32",
                              attn_impl="xla", **kw, **dec)
    ours = VideoMAEForPreTraining(ours_cfg)
    params = convert_hf_videomae(_hf_state_numpy(hf), num_layers=2,
                                 decoder_layers=1)

    n = ours_cfg.seq_len
    mask = np.zeros(n, bool)
    mask[np.arange(0, n, 2)] = True
    x = torch.randn(1, 16, 1, 32, 32)
    with torch.no_grad():
        ref = hf(x, bool_masked_pos=torch.tensor(mask)[None])
    out = ours.apply(params, jnp.asarray(x.numpy()),
                     jnp.asarray(mask)[None], int(mask.sum()))
    np.testing.assert_allclose(np.asarray(out["logits"]),
                               ref.logits.numpy(), **TOL)
    np.testing.assert_allclose(float(out["loss"]), float(ref.loss),
                               rtol=1e-4)


def test_vjepa2_classification_pooler_matches_hf():
    """Attentive pooler (3 self-attn + 1 cross-attn, no o_proj) + classifier
    vs HF torch with converted weights."""
    from transformers import VJEPA2Config as HFConfig
    from transformers import VJEPA2ForVideoClassification as HFModel

    from smb_vision_tpu.models.configs import VJEPA2Config
    from smb_vision_tpu.models.vjepa import VJEPA2ForVideoClassification
    from smb_vision_tpu.utils.serialization import (
        flatten_params,
        unflatten_params,
    )

    kw = dict(patch_size=8, crop_size=32, frames_per_clip=16, tubelet_size=8,
              in_chans=1, hidden_size=48, num_attention_heads=2,
              num_hidden_layers=2, pred_hidden_size=24,
              pred_num_attention_heads=2, pred_num_hidden_layers=1,
              pred_num_mask_tokens=4, num_pooler_layers=2)
    hf = HFModel(HFConfig(num_labels=3, **kw)).eval()
    ours_cfg = VJEPA2Config(num_labels=3, dtype="float32", attn_impl="xla",
                            **kw)
    ours = VJEPA2ForVideoClassification(ours_cfg)
    conv = convert_hf_vjepa2(_hf_state_numpy(hf), num_layers=2,
                             pred_layers=1)
    # nest encoder/predictor under the vjepa2 submodule of the cls model
    flat = flatten_params(conv)
    remapped = {}
    for k, v in flat.items():
        if k.startswith("params.encoder.") or k.startswith(
                "params.predictor."):
            remapped["params.vjepa2." + k[len("params."):]] = v
        else:
            remapped[k] = v
    params = unflatten_params(remapped)

    x = torch.randn(2, 16, 1, 32, 32)
    with torch.no_grad():
        ref = hf(pixel_values_videos=x).logits.numpy()
    out = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(out["logits"]), ref, **TOL)


def test_videomae_export_roundtrip_into_torch():
    """ours -> HF state dict -> load into a torch VideoMAEForPreTraining ->
    identical loss/logits: the push_to_hub round trip."""
    from transformers import VideoMAEConfig as HFConfig
    from transformers import VideoMAEForPreTraining as HFModel

    from smb_vision_tpu.models.configs import VideoMAEConfig
    from smb_vision_tpu.models.convert import export_hf_videomae
    from smb_vision_tpu.models.videomae import VideoMAEForPreTraining

    kw = dict(image_size=32, patch_size=8, num_channels=1, num_frames=16,
              tubelet_size=8, hidden_size=32, num_hidden_layers=2,
              num_attention_heads=2, intermediate_size=64)
    dec = dict(decoder_hidden_size=24, decoder_num_hidden_layers=1,
               decoder_num_attention_heads=2, decoder_intermediate_size=48)
    ours_cfg = VideoMAEConfig(norm_pix_loss=True, dtype="float32",
                              attn_impl="xla", **kw, **dec)
    ours = VideoMAEForPreTraining(ours_cfg)
    key = jax.random.PRNGKey(3)
    n = ours_cfg.seq_len
    mask = np.zeros(n, bool)
    mask[np.arange(0, n, 2)] = True
    x = np.random.default_rng(0).normal(size=(1, 16, 1, 32, 32)).astype(
        np.float32)
    params = ours.init(key, jnp.asarray(x), jnp.asarray(mask)[None],
                       int(mask.sum()))

    state = export_hf_videomae(params, num_layers=2, decoder_layers=1)
    hf = HFModel(HFConfig(norm_pix_loss=True, **kw, **dec)).eval()
    missing, unexpected = hf.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in state.items()}, strict=False)
    # only non-param buffers (fixed sincos position tables) may be missing
    assert not unexpected, unexpected
    assert all("position_embeddings" in m for m in missing), missing

    with torch.no_grad():
        ref = hf(torch.from_numpy(x), bool_masked_pos=torch.tensor(mask)[None])
    out = ours.apply(params, jnp.asarray(x), jnp.asarray(mask)[None],
                     int(mask.sum()))
    np.testing.assert_allclose(np.asarray(out["logits"]), ref.logits.numpy(),
                               **TOL)
    np.testing.assert_allclose(float(out["loss"]), float(ref.loss),
                               rtol=1e-4)


def test_vjepa2_export_roundtrip_into_torch():
    """ours -> HF state dict -> load into upstream torch VJEPA2Model ->
    identical encoder/predictor outputs (the push_to_hub round trip for the
    V-JEPA flagship, reference upload_model.py:6-23)."""
    from transformers import VJEPA2Config as HFConfig
    from transformers import VJEPA2Model as HFModel

    from smb_vision_tpu.models.configs import VJEPA2Config
    from smb_vision_tpu.models.convert import export_hf_vjepa2
    from smb_vision_tpu.models.vjepa import VJEPA2Model

    kw = dict(patch_size=8, crop_size=32, frames_per_clip=16, tubelet_size=8,
              in_chans=1, hidden_size=48, num_attention_heads=2,
              num_hidden_layers=2, pred_hidden_size=24,
              pred_num_attention_heads=2, pred_num_hidden_layers=2,
              pred_num_mask_tokens=4)
    ours_cfg = VJEPA2Config(dtype="float32", attn_impl="xla", **kw)
    ours = VJEPA2Model(ours_cfg)
    x = np.random.default_rng(0).normal(size=(1, 16, 1, 32, 32)).astype(
        np.float32)
    n = ours_cfg.seq_len
    ctx_idx = np.arange(0, n, 2)
    tgt_idx = np.arange(1, n, 2)
    params = ours.init(jax.random.PRNGKey(7), jnp.asarray(x),
                       context_mask=[jnp.asarray(ctx_idx)[None]],
                       target_mask=[jnp.asarray(tgt_idx)[None]])

    state = export_hf_vjepa2(params, num_layers=2, pred_layers=2)
    hf = HFModel(HFConfig(**kw)).eval()
    missing, unexpected = hf.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in state.items()}, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing

    with torch.no_grad():
        ref = hf(pixel_values_videos=torch.from_numpy(x),
                 context_mask=[torch.tensor(ctx_idx)[None]],
                 target_mask=[torch.tensor(tgt_idx)[None]])
    out = ours.apply(params, jnp.asarray(x),
                     context_mask=[jnp.asarray(ctx_idx)[None]],
                     target_mask=[jnp.asarray(tgt_idx)[None]])
    np.testing.assert_allclose(
        np.asarray(out["last_hidden_state"]),
        ref.last_hidden_state.numpy(), **TOL)
    np.testing.assert_allclose(
        np.asarray(out["predictor_output"]),
        ref.predictor_output.last_hidden_state.numpy(), **TOL)

    # and the identity: export -> convert reproduces the original pytree
    back = convert_hf_vjepa2(state, num_layers=2, pred_layers=2)
    from smb_vision_tpu.utils.serialization import flatten_params

    ours_flat = flatten_params(params)
    back_flat = flatten_params(back)
    assert set(back_flat) == set(ours_flat), (
        set(ours_flat) ^ set(back_flat))
    for k in ours_flat:
        np.testing.assert_allclose(np.asarray(back_flat[k]),
                                   np.asarray(ours_flat[k]), atol=1e-7,
                                   err_msg=k)


def _dinov2_pair(use_swiglu):
    from transformers import Dinov2Config as HFConfig
    from transformers import Dinov2ForImageClassification as HFModel

    from smb_vision_tpu.models.configs import Dinov2Config
    from smb_vision_tpu.models.convert import convert_hf_dinov2
    from smb_vision_tpu.models.dinov2 import Dinov2ForImageClassification

    hf = HFModel(HFConfig(
        image_size=32, patch_size=8, num_channels=1, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, mlp_ratio=2,
        layerscale_value=0.7, use_swiglu_ffn=use_swiglu,
        num_labels=3)).eval()
    ours_cfg = Dinov2Config(
        image_size=32, patch_size=8, num_channels=1, depth=8,  # gd = 1
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        mlp_ratio=2, layerscale_value=0.7, use_swiglu_ffn=use_swiglu,
        num_labels=3, problem_type="single_label_classification",
        dtype="float32", attn_impl="xla")
    ours = Dinov2ForImageClassification(ours_cfg)
    params = convert_hf_dinov2(_hf_state_numpy(hf), num_layers=2,
                               depth_patch=8)
    return hf, ours, params


@pytest.mark.parametrize("use_swiglu", [False, True])
def test_dinov2_matches_hf_via_depth_inflation(use_swiglu):
    """DINOv2 numeric parity (VERDICT r1 missing item 6): our 3D model with
    I3D depth-inflated 2D weights on a depth-constant volume must reproduce
    upstream HF Dinov2 exactly — anchors patch embed, CLS/pos handling,
    layerscale blocks, (SwiGLU-)MLP, final LN and the cat[CLS, mean] head."""
    hf, ours, params = _dinov2_pair(use_swiglu)
    img = torch.randn(2, 1, 32, 32)
    vol = jnp.asarray(img.numpy())[..., None].repeat(8, -1)  # (B,1,32,32,8)
    with torch.no_grad():
        ref = hf(pixel_values=img).logits.numpy()
    out = ours.apply(params, vol)
    np.testing.assert_allclose(np.asarray(out["logits"]), ref, **TOL)


def test_dinov2_mask_token_matches_hf():
    """Masked-embedding path (reference modeling_dinov2.py:99-118)."""
    from transformers import Dinov2Config as HFConfig
    from transformers import Dinov2Model as HFBackbone

    from smb_vision_tpu.models.configs import Dinov2Config
    from smb_vision_tpu.models.convert import convert_hf_dinov2
    from smb_vision_tpu.models.dinov2 import Dinov2Model

    hf = HFBackbone(HFConfig(
        image_size=32, patch_size=8, num_channels=1, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, mlp_ratio=2,
        layerscale_value=0.7, use_mask_token=True)).eval()
    # give the mask token a nonzero value so the path is actually exercised
    with torch.no_grad():
        hf.embeddings.mask_token.normal_(0, 0.5)
    ours_cfg = Dinov2Config(
        image_size=32, patch_size=8, num_channels=1, depth=8,
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        mlp_ratio=2, layerscale_value=0.7, dtype="float32",
        attn_impl="xla")
    ours = Dinov2Model(ours_cfg)
    conv = convert_hf_dinov2(_hf_state_numpy(hf), num_layers=2,
                             depth_patch=8)
    # bare backbone: strip the dinov2. nesting
    from smb_vision_tpu.utils.serialization import (
        flatten_params,
        unflatten_params,
    )
    flat = flatten_params(conv)
    params = unflatten_params(
        {k.replace("params.dinov2.", "params."): v for k, v in flat.items()})

    img = torch.randn(1, 1, 32, 32)
    vol = jnp.asarray(img.numpy())[..., None].repeat(8, -1)
    mask = np.zeros((1, 16), bool)
    mask[0, [1, 5, 6, 10]] = True
    with torch.no_grad():
        ref = hf(pixel_values=img,
                 bool_masked_pos=torch.tensor(mask)).last_hidden_state
    out = ours.apply(params, vol, bool_masked_pos=jnp.asarray(mask))
    np.testing.assert_allclose(np.asarray(out), ref.numpy(), **TOL)


def test_dinov2_export_roundtrip():
    """export_hf_dinov2 -> convert_hf_dinov2 is the identity, and the
    exported 2D-equivalent slice loads into upstream torch Dinov2."""
    from smb_vision_tpu.models.configs import Dinov2Config
    from smb_vision_tpu.models.convert import (
        convert_hf_dinov2,
        export_hf_dinov2,
    )
    from smb_vision_tpu.models.dinov2 import Dinov2ForImageClassification
    from smb_vision_tpu.utils.serialization import flatten_params

    cfg = Dinov2Config(
        image_size=32, patch_size=8, num_channels=1, depth=16,
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        mlp_ratio=2, layerscale_value=0.7, num_labels=3,
        problem_type="single_label_classification", dtype="float32",
        attn_impl="xla")
    model = Dinov2ForImageClassification(cfg)
    vol = jnp.zeros((1, 1, 32, 32, 16))
    params = model.init(jax.random.PRNGKey(11), vol)
    state = export_hf_dinov2(params, num_layers=2)
    assert any(k.startswith("dinov2.encoder.layer.0.") for k in state)
    back = convert_hf_dinov2(state, num_layers=2)
    ours = flatten_params(params)
    theirs = flatten_params(back)
    assert set(ours) == set(theirs), set(ours) ^ set(theirs)
    for k in ours:
        np.testing.assert_allclose(np.asarray(theirs[k]),
                                   np.asarray(ours[k]), atol=1e-7,
                                   err_msg=k)


def test_dinov2_2d_pos_embeddings_inflate_across_depth():
    """convert_hf_dinov2(depth_grid=) must tile the 2D position table
    across the depth grid in the model's (h, w, d) token order — without
    it any depth_grid > 1 target got a size-mismatched table (crash at
    apply, or silent random-init pos under grafting)."""
    from transformers import Dinov2Config as HFConfig
    from transformers import Dinov2ForImageClassification as HFModel

    from smb_vision_tpu.models.configs import Dinov2Config
    from smb_vision_tpu.models.convert import convert_hf_dinov2
    from smb_vision_tpu.models.dinov2 import Dinov2ForImageClassification

    hf = HFModel(HFConfig(
        image_size=32, patch_size=8, num_channels=1, hidden_size=32,
        num_hidden_layers=2, num_attention_heads=2, mlp_ratio=2,
        layerscale_value=0.7, num_labels=3)).eval()
    cfg = Dinov2Config(
        image_size=32, patch_size=8, num_channels=1, depth=16,  # gd = 2
        hidden_size=32, num_hidden_layers=2, num_attention_heads=2,
        mlp_ratio=2, layerscale_value=0.7, num_labels=3,
        problem_type="single_label_classification",
        dtype="float32", attn_impl="xla")
    assert cfg.grid == (4, 4, 2) and cfg.seq_len == 32
    params = convert_hf_dinov2(_hf_state_numpy(hf), num_layers=2,
                               depth_patch=8, depth_grid=2)

    pos3d = np.asarray(
        params["params"]["dinov2"]["position_embeddings_3d"])
    pos2d = hf.dinov2.embeddings.position_embeddings.detach().numpy()
    assert pos3d.shape == (1, 33, 32)
    # token order (h, w, d): depth fastest -> each spatial position's two
    # depth copies carry the same 2D embedding
    for t in range(16):
        np.testing.assert_array_equal(pos3d[0, 1 + 2 * t],
                                      pos2d[0, 1 + t])
        np.testing.assert_array_equal(pos3d[0, 1 + 2 * t + 1],
                                      pos2d[0, 1 + t])

    # the converted tree must run (the old behavior shape-crashed here)
    out = Dinov2ForImageClassification(cfg).apply(
        params, jnp.zeros((1, 1, 32, 32, 16)))
    assert np.asarray(out["logits"]).shape == (1, 3)
