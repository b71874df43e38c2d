"""Hub checkpoint interop (round-3 VERDICT #8): the reference pulls
published checkpoints straight from the HF hub by repo id
(/root/reference/src/run_inference.py:70); here `load_backbone_into`
accepts (a) this framework's safetensors export, (b) an HF torch-schema
checkpoint file or directory — auto-detected per family and routed
through convert_hf_* — and (c) an 'org/name' hub repo id, resolved via a
gated huggingface_hub download (mocked here: zero-egress environment)."""

import sys
import types

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smb_vision_tpu.models.configs import VideoMAEConfig
from smb_vision_tpu.models.convert import (
    convert_hf_auto,
    load_backbone_into,
    resolve_checkpoint_source,
)
from smb_vision_tpu.models.videomae import VideoMAEModel

KEY = jax.random.PRNGKey(0)


def _tiny_cfg():
    return VideoMAEConfig(
        image_size=32, num_frames=16, patch_size=8, tubelet_size=8,
        num_channels=1, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=2, intermediate_size=64, dtype="float32",
        attn_impl="xla")


def _params_and_hf_dir(tmp_path):
    """Init a tiny VideoMAE, export it in the HF torch schema to a
    checkpoint directory, and return (model params, dir)."""
    from safetensors.numpy import save_file

    from smb_vision_tpu.models.convert import export_hf_videomae

    cfg = _tiny_cfg()
    model = VideoMAEModel(cfg)
    px = jnp.zeros((1, 16, 1, 32, 32), jnp.float32)
    params = model.init(KEY, px)
    hf_state = export_hf_videomae(params, cfg.num_hidden_layers)
    d = tmp_path / "hub_snapshot"
    d.mkdir()
    save_file({k: np.ascontiguousarray(v) for k, v in hf_state.items()},
              str(d / "model.safetensors"))
    return params, d


def test_hf_directory_autoconverts(tmp_path):
    """An HF-schema checkpoint dir (torch key names, transposed Linear
    kernels) grafts through convert_hf_auto with exact values."""
    params, d = _params_and_hf_dir(tmp_path)
    model = VideoMAEModel(_tiny_cfg())
    px = jnp.zeros((1, 16, 1, 32, 32), jnp.float32)
    fresh = model.init(jax.random.PRNGKey(1), px)
    loaded = load_backbone_into(fresh, str(d))
    ref = model.apply(params, px)[0]
    out = model.apply(loaded, px)[0]
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               rtol=1e-6, atol=1e-6)


def test_hub_repo_id_mocked_download(tmp_path, monkeypatch):
    """'org/name' resolves through huggingface_hub.snapshot_download
    (mocked — this environment has no egress), then the existing convert
    path grafts the snapshot."""
    params, d = _params_and_hf_dir(tmp_path)
    calls = {}

    def snapshot_download(repo_id, **kw):
        calls["repo_id"] = repo_id
        calls["kw"] = kw
        return str(d)

    fake = types.ModuleType("huggingface_hub")
    fake.snapshot_download = snapshot_download
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)

    assert resolve_checkpoint_source("acme/ct-model") == str(d)
    assert calls["repo_id"] == "acme/ct-model"

    model = VideoMAEModel(_tiny_cfg())
    px = jnp.zeros((1, 16, 1, 32, 32), jnp.float32)
    fresh = model.init(jax.random.PRNGKey(1), px)
    loaded = load_backbone_into(fresh, "acme/ct-model")
    np.testing.assert_allclose(
        np.asarray(model.apply(loaded, px)[0]),
        np.asarray(model.apply(params, px)[0]), rtol=1e-6, atol=1e-6)


def test_bad_source_rejected(monkeypatch):
    with pytest.raises(FileNotFoundError, match="hub"):
        resolve_checkpoint_source("/no/such/checkpoint.safetensors")
    with pytest.raises(FileNotFoundError, match="hub"):
        resolve_checkpoint_source("not-a-repo-id")
    # a MISSING local path with a checkpoint-file suffix must never be
    # rerouted to a hub lookup (network hang in zero-egress envs)
    fake = types.ModuleType("huggingface_hub")

    def boom(*a, **k):
        raise AssertionError("hub lookup attempted for a file path")
    fake.snapshot_download = boom
    monkeypatch.setitem(sys.modules, "huggingface_hub", fake)
    with pytest.raises(FileNotFoundError, match="hub"):
        resolve_checkpoint_source("outputs/best.safetensors")
    # a repo-id-shaped source whose download fails surfaces BOTH readings
    def down(*a, **k):
        raise RuntimeError("401 repo not found")
    fake.snapshot_download = down
    with pytest.raises(FileNotFoundError, match="no such local path"):
        resolve_checkpoint_source("outputs/best")


def test_convert_hf_auto_detects_families():
    """Family detection keys off schema markers, not file names."""
    # videomae (no cls_token, projection patch embed, encoder.layer.N)
    vm = {"embeddings.patch_embeddings.projection.weight":
          np.zeros((4, 1, 8, 8, 8), np.float32),
          "encoder.layer.0.layernorm_before.weight":
          np.ones((4,), np.float32)}
    out = convert_hf_auto(vm)
    assert "videomae" in out["params"] or "patch_embed_kernel" in str(out)
    # vjepa2 (predictor + proj patch embed)
    vj = {"encoder.embeddings.patch_embeddings.proj.weight":
          np.zeros((4, 1, 8, 8, 8), np.float32),
          "encoder.layer.0.norm1.weight": np.ones((4,), np.float32),
          "predictor.layer.0.norm1.weight": np.ones((4,), np.float32)}
    out = convert_hf_auto(vj)
    assert "encoder" in out["params"]
    # unknown schema
    with pytest.raises(ValueError, match="unrecognised"):
        convert_hf_auto({"foo.bar": np.zeros((1,), np.float32)})
