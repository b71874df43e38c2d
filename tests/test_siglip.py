"""SigLIP vision tower: golden parity vs the torch transformers
implementation (the reference runs torch SiglipVisionModel for 2D X-ray
embedding, reference src/encoders/run_siglip.py:49-120), export round-trip,
and the JAX-backend SiglipEncoder end-to-end against a local checkpoint."""

import numpy as np
import pytest
import torch

import jax.numpy as jnp

from smb_vision_tpu.models.configs import SiglipVisionConfig
from smb_vision_tpu.models.convert import (
    convert_hf_siglip,
    export_hf_siglip,
)
from smb_vision_tpu.models.siglip import SiglipVisionModel

TOL = dict(atol=2e-4, rtol=2e-4)

TINY = dict(image_size=32, patch_size=8, num_channels=3, hidden_size=32,
            num_hidden_layers=2, num_attention_heads=2,
            intermediate_size=64)


def _hf_state_numpy(model):
    return {k: v.detach().numpy() for k, v in model.state_dict().items()}


@pytest.fixture(scope="module")
def siglip_pair():
    from transformers import SiglipVisionConfig as HFConfig
    from transformers import SiglipVisionModel as HFModel

    hf = HFModel(HFConfig(**TINY)).eval()
    ours_cfg = SiglipVisionConfig(dtype="float32", attn_impl="xla", **TINY)
    ours = SiglipVisionModel(ours_cfg)
    params = convert_hf_siglip(_hf_state_numpy(hf), num_layers=2)
    return hf, ours, params, ours_cfg


def test_siglip_matches_hf(siglip_pair):
    hf, ours, params, cfg = siglip_pair
    x = torch.randn(2, 3, 32, 32)
    with torch.no_grad():
        ref = hf(x)
    tokens, pooled = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(tokens),
                               ref.last_hidden_state.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(), **TOL)


def test_siglip_no_head(siglip_pair):
    """vision_use_head=False checkpoints: no MAP head params, pooled=None."""
    from transformers import SiglipVisionConfig as HFConfig
    from transformers import SiglipVisionModel as HFModel

    hf = HFModel(HFConfig(vision_use_head=False, **TINY)).eval()
    cfg = SiglipVisionConfig(dtype="float32", attn_impl="xla",
                             vision_use_head=False, **TINY)
    ours = SiglipVisionModel(cfg)
    params = convert_hf_siglip(_hf_state_numpy(hf), num_layers=2)
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref = hf(x).last_hidden_state.numpy()
    tokens, pooled = ours.apply(params, jnp.asarray(x.numpy()))
    assert pooled is None
    np.testing.assert_allclose(np.asarray(tokens), ref, **TOL)


def test_siglip_export_roundtrip(siglip_pair):
    """our params -> HF state -> back: bit-identical tensors, and the
    exported state loads into the torch model producing the same output."""
    from transformers import SiglipVisionConfig as HFConfig
    from transformers import SiglipVisionModel as HFModel

    hf, ours, params, cfg = siglip_pair
    state = export_hf_siglip(params, num_layers=2)
    back = convert_hf_siglip(state, num_layers=2)
    from smb_vision_tpu.utils.serialization import flatten_params

    a, b = flatten_params(params), flatten_params(back)
    assert set(a) == set(b)
    for k in a:
        np.testing.assert_array_equal(np.asarray(a[k]), np.asarray(b[k]),
                                      err_msg=k)

    hf2 = HFModel(HFConfig(**TINY)).eval()
    missing, unexpected = hf2.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in state.items()}, strict=False)
    assert not unexpected
    # position_ids buffers may be reported missing on some versions
    assert all("position_ids" in k for k in missing)
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref = hf(x).pooler_output.numpy()
        out = hf2(x).pooler_output.numpy()
    np.testing.assert_allclose(out, ref, atol=1e-6)


def test_siglip_wrong_geometry_raises(siglip_pair):
    _, ours, params, _ = siglip_pair
    with pytest.raises(ValueError, match="image_size"):
        ours.apply(params, jnp.zeros((1, 3, 48, 48)))


def test_siglip_encoder_jax_backend(tmp_path, siglip_pair):
    """SiglipEncoder(backend='jax') against a locally saved HF checkpoint
    matches the torch backend on the same batch."""
    from smb_vision_tpu.inference.encoders import SiglipEncoder

    hf, _, _, _ = siglip_pair
    hf.save_pretrained(tmp_path / "ckpt")

    enc = SiglipEncoder(str(tmp_path / "ckpt"), backend="jax",
                        dtype="float32", attn_impl="xla")
    enc.setup_model()
    assert enc.image_size == 32      # picked up from the checkpoint config
    batch = np.random.default_rng(0).normal(
        size=(2, 3, 32, 32)).astype(np.float32)
    out = enc.generate_embedding(batch)

    with torch.no_grad():
        ref = hf(torch.from_numpy(batch)).pooler_output.numpy()
    np.testing.assert_allclose(out, ref, **TOL)


def test_siglip_encoder_unknown_backend():
    from smb_vision_tpu.inference.encoders import SiglipEncoder

    with pytest.raises(ValueError, match="backend"):
        SiglipEncoder("/nonexistent", backend="cuda")


def test_run_encoders_siglip_cli(tmp_path, siglip_pair):
    """Full zoo path (reference run_siglip.py:167-181): manifest -> JAX
    SigLIP -> parquet per uid, resume skips processed uids."""
    import json

    from PIL import Image

    from smb_vision_tpu.cli.run_encoders import main

    hf, _, _, _ = siglip_pair
    hf.save_pretrained(tmp_path / "ckpt")

    rng = np.random.default_rng(1)
    items = []
    for uid in ("xr-1", "xr-2", "xr-3"):
        p = tmp_path / f"{uid}.png"
        Image.fromarray(rng.integers(0, 255, (40, 40, 3), np.uint8)
                        ).save(p)
        items.append({"uid": uid, "image_path": str(p)})
    manifest = tmp_path / "manifest.json"
    manifest.write_text(json.dumps({"images": items}))

    out = tmp_path / "emb"
    argv = ["--encoder", "siglip", "--checkpoint", str(tmp_path / "ckpt"),
            "--input_json", str(manifest), "--output_dir", str(out),
            "--batch_size", "2", "--siglip_backend", "jax"]
    main(argv)
    part = out / "model_id=siglip"
    files = sorted(f.name for f in part.glob("*.parquet"))
    assert files == ["xr-1.parquet", "xr-2.parquet", "xr-3.parquet"]

    import pandas as pd

    df = pd.read_parquet(part / "xr-1.parquet")
    assert df.iloc[0]["model_id"] == "siglip"
    assert len(np.asarray(df.iloc[0]["embedding"])) == 32  # hidden_size

    # resume: second run embeds nothing new
    main(argv)  # must not raise; existing uids skipped


def test_patch_embed_2d_non_divisible_matches_conv2d():
    """image_size % patch_size != 0 (so400m-patch14-384 has 384 % 14 == 6):
    HF Conv2d valid padding floors the grid and never touches the trailing
    pixels; patch_embed_2d must crop identically instead of crashing."""
    from smb_vision_tpu.ops.patches import patch_embed_2d

    rng = np.random.default_rng(7)
    px = rng.normal(size=(2, 3, 32, 32)).astype(np.float32)
    kernel = rng.normal(size=(16, 3, 12, 12)).astype(np.float32) * 0.05
    bias = rng.normal(size=(16,)).astype(np.float32)

    conv = torch.nn.Conv2d(3, 16, kernel_size=12, stride=12)
    with torch.no_grad():
        conv.weight.copy_(torch.from_numpy(kernel))
        conv.bias.copy_(torch.from_numpy(bias))
        ref = conv(torch.from_numpy(px))          # (2, 16, 2, 2)
    ref = ref.flatten(2).transpose(1, 2).numpy()  # (2, 4, 16)

    out = np.asarray(patch_embed_2d(jnp.asarray(px), jnp.asarray(kernel),
                                    jnp.asarray(bias), dtype=jnp.float32))
    assert out.shape == (2, 4, 16)
    np.testing.assert_allclose(out, ref, atol=2e-4, rtol=2e-4)


def test_siglip_non_divisible_geometry_matches_hf():
    """Full tower at a non-divisible geometry (grid floors to 2x2)."""
    from transformers import SiglipVisionConfig as HFConfig
    from transformers import SiglipVisionModel as HFModel

    tiny = dict(TINY, patch_size=12)              # 32 % 12 == 8
    hf = HFModel(HFConfig(**tiny)).eval()
    cfg = SiglipVisionConfig(dtype="float32", attn_impl="xla", **tiny)
    assert cfg.seq_len == 4
    ours = SiglipVisionModel(cfg)
    params = convert_hf_siglip(_hf_state_numpy(hf), num_layers=2)
    x = torch.randn(1, 3, 32, 32)
    with torch.no_grad():
        ref = hf(x)
    tokens, pooled = ours.apply(params, jnp.asarray(x.numpy()))
    np.testing.assert_allclose(np.asarray(tokens),
                               ref.last_hidden_state.numpy(), **TOL)
    np.testing.assert_allclose(np.asarray(pooled),
                               ref.pooler_output.numpy(), **TOL)


def test_sharded_checkpoint_merge(tmp_path):
    """Directories with model-0000i-of-0000N.safetensors shards must load
    the UNION of shards, not an arbitrary first glob hit."""
    from safetensors.numpy import save_file

    from smb_vision_tpu.models.convert import load_hf_checkpoint_numpy

    a = {"vision_model.embeddings.patch_embedding.weight":
         np.ones((4, 3, 2, 2), np.float32)}
    b = {"vision_model.post_layernorm.weight": np.ones(4, np.float32)}
    save_file(a, str(tmp_path / "model-00001-of-00002.safetensors"))
    save_file(b, str(tmp_path / "model-00002-of-00002.safetensors"))

    state = load_hf_checkpoint_numpy(str(tmp_path))
    assert set(state) == set(a) | set(b)
