"""Inference subsystem: encoder runner, manifest validation, convert."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smb_vision_tpu.data.nifti import save_nifti
from smb_vision_tpu.inference.runner import BaseEncoderRunner, SmbVisionEncoder
from smb_vision_tpu.utils.args import parse_args_into_dataclasses


def _mk_dataset(tmp_path, rng, n=3):
    items = []
    for i in range(n):
        vol = rng.normal(0, 300, (24, 24, 16)).astype(np.float32)
        p = tmp_path / f"v{i}.nii.gz"
        save_nifti(p, vol)
        items.append({"uid": f"v{i}", "image_path": str(p)})
    return items


def test_manifest_validation(tmp_path):
    bad = tmp_path / "bad.json"
    bad.write_text(json.dumps({"images": [{"image_path": "x.nii"}]}))
    with pytest.raises(ValueError, match="uid"):
        BaseEncoderRunner.load_input_json(str(bad))
    good = tmp_path / "good.json"
    good.write_text(json.dumps({"images": [
        {"uid": "a", "image_path": "x.nii"}]}))
    assert BaseEncoderRunner.load_input_json(str(good))[0]["uid"] == "a"


def test_runner_end_to_end_with_errors(tmp_path, rng):
    from smb_vision_tpu.models.configs import VideoMAEConfig

    cfg = VideoMAEConfig(image_size=16, num_frames=16, patch_size=8,
                         tubelet_size=8, num_channels=1, hidden_size=32,
                         num_hidden_layers=1, num_attention_heads=2,
                         intermediate_size=64, dtype="float32",
                         attn_impl="xla")
    cfg_path = tmp_path / "config.json"
    cfg.save_json(cfg_path)

    items = _mk_dataset(tmp_path, rng)
    items.append({"uid": "missing", "image_path": str(tmp_path / "no.nii")})

    enc = SmbVisionEncoder(config_path=str(cfg_path), model_id="test-enc",
                           dtype="float32", attn_impl="xla")
    runner = BaseEncoderRunner(enc, str(tmp_path / "out"), fmt="npy",
                               batch_size=2, num_workers=2)
    stats = runner.run(items)
    assert stats["embedded"] == 3 and stats["failed"] == 1
    assert (tmp_path / "out" / "v0.npy").exists()
    assert (tmp_path / "out" / "error_files.json").exists()

    # resume: everything skipped, failure retried
    stats2 = runner.run(items)
    assert stats2["skipped"] == 3 and stats2["failed"] == 1


def test_args_json_file_mode(tmp_path):
    from smb_vision_tpu.cli.run_mim import DataTrainingArguments, ModelArguments

    cfg = tmp_path / "a.json"
    cfg.write_text(json.dumps({"json_path": "x.json", "mask_ratio": 0.75,
                               "image_size": 96, "unknown_key": 1}))
    m, d = parse_args_into_dataclasses(
        (ModelArguments, DataTrainingArguments), [str(cfg)])
    assert d.json_path == "x.json" and d.mask_ratio == 0.75
    assert m.image_size == 96


def test_args_list_and_bool():
    from smb_vision_tpu.cli.run_classification import DataTrainingArguments

    (d,) = parse_args_into_dataclasses(
        (DataTrainingArguments,),
        ["--label_columns", "a", "b", "--task_type",
         "multilabel_classification"])
    assert d.label_columns == ["a", "b"]


def test_convert_hf_videomae_roundtrip(rng):
    """Our flax params -> fake HF layout -> convert -> identical forward."""
    from smb_vision_tpu.models.configs import VideoMAEConfig
    from smb_vision_tpu.models.convert import convert_hf_videomae
    from smb_vision_tpu.models.videomae import VideoMAEModel

    cfg = VideoMAEConfig(image_size=16, num_frames=16, patch_size=8,
                         tubelet_size=8, num_channels=1, hidden_size=32,
                         num_hidden_layers=2, num_attention_heads=2,
                         intermediate_size=64, dtype="float32",
                         attn_impl="xla", use_mean_pooling=True)
    model = VideoMAEModel(cfg)
    key = jax.random.PRNGKey(0)
    px = jnp.asarray(rng.normal(size=(1, 16, 1, 16, 16)), jnp.float32)
    params = model.init(key, px)

    # fabricate the HF state dict from our params (inverse mapping)
    from smb_vision_tpu.utils.serialization import flatten_params

    flat = flatten_params(params)
    hf = {}
    hf["videomae.embeddings.patch_embeddings.projection.weight"] = \
        flat["params.patch_embed_kernel"]
    hf["videomae.embeddings.patch_embeddings.projection.bias"] = \
        flat["params.patch_embed_bias"]
    for i in range(2):
        o = f"params.encoder.layer_{i}."
        p = f"videomae.encoder.layer.{i}."
        hf[p + "attention.attention.query.weight"] = \
            flat[o + "attention.query.kernel"].T
        hf[p + "attention.attention.q_bias"] = \
            flat[o + "attention.query.bias"]
        hf[p + "attention.attention.key.weight"] = \
            flat[o + "attention.key.kernel"].T
        hf[p + "attention.attention.value.weight"] = \
            flat[o + "attention.value.kernel"].T
        hf[p + "attention.attention.v_bias"] = \
            flat[o + "attention.value.bias"]
        hf[p + "attention.output.dense.weight"] = \
            flat[o + "attention.proj.kernel"].T
        hf[p + "attention.output.dense.bias"] = \
            flat[o + "attention.proj.bias"]
        hf[p + "intermediate.dense.weight"] = flat[o + "mlp.fc1.kernel"].T
        hf[p + "intermediate.dense.bias"] = flat[o + "mlp.fc1.bias"]
        hf[p + "output.dense.weight"] = flat[o + "mlp.fc2.kernel"].T
        hf[p + "output.dense.bias"] = flat[o + "mlp.fc2.bias"]
        hf[p + "layernorm_before.weight"] = flat[o + "norm1.scale"]
        hf[p + "layernorm_before.bias"] = flat[o + "norm1.bias"]
        hf[p + "layernorm_after.weight"] = flat[o + "norm2.scale"]
        hf[p + "layernorm_after.bias"] = flat[o + "norm2.bias"]

    converted = convert_hf_videomae(hf, num_layers=2)
    # graft into the videomae-wrapped namespace: converted tree is
    # params.videomae.* (head-model layout); bare encoder wants params.*
    conv_flat = flatten_params(converted)
    rebuilt = {k.replace("params.videomae.", "params."): v
               for k, v in conv_flat.items()}
    from smb_vision_tpu.utils.serialization import unflatten_params

    params2 = unflatten_params(rebuilt)
    out1, _ = model.apply(params, px)
    out2, _ = model.apply(params2, px)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out2),
                               atol=1e-6)


def test_build_encoder_manifest_script(tmp_path):
    """LLaVA-style raw JSON -> encoder-runner manifest (the reference's
    llava-med build_json analog), incl. the misspelled 'conversatons' key
    and missing-file skipping."""
    import sys

    sys.path.insert(0, "scripts")
    from build_encoder_manifest import main as build_main

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    (img_dir / "a.png").write_bytes(b"x")
    raw = [
        {"id": "u1", "image": "a.png",
         "conversatons": [{"from": "human", "value": "?"}]},
        {"id": "u2", "image": "missing.png"},
        {"image": "a.png"},  # no id
    ]
    (tmp_path / "raw.json").write_text(json.dumps(raw))
    out = tmp_path / "m" / "manifest.json"
    rc = build_main(["--input_json", str(tmp_path / "raw.json"),
                     "--image_dir", str(img_dir),
                     "--output_json", str(out)])
    assert rc == 0
    m = json.loads(out.read_text())
    assert len(m["images"]) == 1
    e = m["images"][0]
    assert e["uid"] == "u1" and e["image_path"].endswith("a.png")
    assert e["metadata"]["conversations"][0]["from"] == "human"

    # the produced manifest is directly consumable by the runner's loader
    items = BaseEncoderRunner.load_input_json(str(out))
    assert [i["uid"] for i in items] == ["u1"]

class _StubEncoder:
    """Records batch shapes; embedding = per-image mean so uid->content
    pairing is checkable."""

    model_id = "stub"

    def __init__(self, image_size=8):
        self.image_size = image_size
        self.batch_shapes = []

    def create_dataset(self, items):
        from smb_vision_tpu.data.image2d import Image2DDataset

        return Image2DDataset(items, image_size=self.image_size)

    def setup_model(self):
        pass

    def generate_embedding(self, batch):
        self.batch_shapes.append(batch.shape)
        return batch.reshape(batch.shape[0], -1).mean(axis=1, keepdims=True)

    def process_batch(self, batch_items, pixels):
        emb = np.asarray(self.generate_embedding(pixels))
        return [emb[i] for i in range(len(batch_items))]


def _mk_pngs(tmp_path, uids, corrupt=()):
    from PIL import Image

    items = []
    for i, uid in enumerate(uids):
        p = tmp_path / f"{uid}.png"
        if uid in corrupt:
            p.write_bytes(b"not a png at all")
        else:
            Image.fromarray(
                np.full((8, 8, 3), 10 * (i + 1), np.uint8)).save(p)
        items.append({"uid": uid, "image_path": str(p)})
    return items


def test_runner_corrupt_item_keeps_uid_pairing(tmp_path):
    """A corrupt image mid-manifest must be quarantined under ITS uid and
    must not shift later items' embeddings onto wrong uids (Image2DDataset
    used to drop unreadable items at construction, desynchronising the
    runner's todo[i] <-> ds[i] pairing)."""
    items = _mk_pngs(tmp_path, ["a", "b", "c"], corrupt=("b",))
    enc = _StubEncoder()
    runner = BaseEncoderRunner(enc, str(tmp_path / "out"), fmt="npy",
                               batch_size=1, num_workers=2)
    stats = runner.run(items)
    assert stats == {"embedded": 2, "failed": 1, "skipped": 0}

    errors = json.loads(
        (tmp_path / "out" / "error_files.json").read_text())
    assert [e["item"]["uid"] for e in errors] == ["b"]

    # content check: 'c' must hold image c's embedding, not image b's.
    # pixel value 30/255 normalised by (x-0.5)/0.5 -> mean 2*(30/255)-1
    emb_c = np.load(tmp_path / "out" / "c.npy")
    np.testing.assert_allclose(emb_c, [2 * (30 / 255) - 1], atol=1e-6)


def test_runner_pads_ragged_final_batch(tmp_path):
    """The trailing short batch is padded to batch_size (a smaller batch
    would re-trace the compiled model) and pad rows are discarded."""
    items = _mk_pngs(tmp_path, ["a", "b", "c"])
    enc = _StubEncoder()
    runner = BaseEncoderRunner(enc, str(tmp_path / "out"), fmt="npy",
                               batch_size=2, num_workers=2)
    stats = runner.run(items)
    assert stats["embedded"] == 3
    assert enc.batch_shapes == [(2, 3, 8, 8), (2, 3, 8, 8)]
    assert sorted(f.name for f in (tmp_path / "out").glob("*.npy")) == \
        ["a.npy", "b.npy", "c.npy"]


def test_runner_rejects_item_dropping_dataset(tmp_path):
    """Datasets that silently drop items break uid pairing -> hard error."""

    class DroppingEncoder(_StubEncoder):
        def create_dataset(self, items):
            ds = super().create_dataset(items)
            ds.items = ds.items[1:]
            return ds

    items = _mk_pngs(tmp_path, ["a", "b"])
    runner = BaseEncoderRunner(DroppingEncoder(), str(tmp_path / "out"),
                               fmt="npy", batch_size=1)
    with pytest.raises(ValueError, match="1:1 index pairing"):
        runner.run(items)


def test_embedding_writer_metadata_merges_across_runs(tmp_path, rng):
    """A resumed run writing a few stragglers must MERGE metadata.json,
    not clobber the first run's records; npy writes are atomic (no .tmp
    residue, no truncated file counted as done)."""
    from smb_vision_tpu.inference.embed import EmbeddingWriter

    w1 = EmbeddingWriter(tmp_path, fmt="npy", model_id="m")
    w1.write({"uid": "a"}, rng.normal(size=(2, 2)).astype(np.float32))
    w1.write({"uid": "b"}, rng.normal(size=(2, 2)).astype(np.float32))
    w1.finalize([])

    w2 = EmbeddingWriter(tmp_path, fmt="npy", model_id="m")
    w2.write({"uid": "c"}, rng.normal(size=(2, 2)).astype(np.float32))
    w2.finalize([])

    meta = json.loads((tmp_path / "metadata.json").read_text())
    assert set(meta) == {"a", "b", "c"}
    assert not list(tmp_path.glob("*.tmp"))
    assert w2.existing_uids() == {"a", "b", "c"}


def test_build_json_disambiguates_colliding_stems(tmp_path):
    """patientA/scan.nii.gz and patientB/scan.nii.gz must not share the
    uid 'scan' (one embedding would silently overwrite the other)."""
    from smb_vision_tpu.data.nifti import save_nifti
    from smb_vision_tpu.inference.embed import (
        EmbeddingWriter,
        build_json_from_nifti_files,
    )

    for pat in ("patientA", "patientB"):
        d = tmp_path / pat
        d.mkdir()
        save_nifti(d / "scan.nii.gz",
                   np.zeros((4, 4, 4), np.float32), np.eye(4))
    items = build_json_from_nifti_files(str(tmp_path))
    w = EmbeddingWriter(tmp_path / "out", fmt="npy")
    uids = [w.uid_of(it) for it in items]
    assert len(set(uids)) == 2, uids


def test_load_data_dict_of_splits_flattens_without_split(tmp_path):
    """split=None on a dict-of-splits JSON must flatten to one item list,
    not return a list of split-lists."""
    from smb_vision_tpu.data.load import load_data

    spec = tmp_path / "spec.json"
    spec.write_text(json.dumps({
        "train": [{"image": "a.nii"}, {"image": "b.nii"}],
        "validation": [{"image": "c.nii"}]}))
    items = load_data(str(spec))
    assert len(items) == 3
    assert all(isinstance(it, dict) and "image" in it for it in items)


def test_sliding_window_inference_compiles_once(rng):
    """Same predictor + geometry across volumes must reuse one compiled
    runner (a fresh @jax.jit closure per call recompiled every volume)."""
    from smb_vision_tpu.inference.sliding_window import (
        sliding_window_inference,
    )

    traces = {"n": 0}

    def predictor(x):
        traces["n"] += 1          # python body runs only while tracing
        return x * 2.0

    n_after_first = None
    for i in range(3):
        vol = jnp.asarray(rng.normal(size=(1, 1, 16, 16, 8))
                          .astype(np.float32))
        out = sliding_window_inference(vol, (8, 8, 8), predictor,
                                       overlap=0.25, sw_batch_size=2)
        np.testing.assert_allclose(np.asarray(out), np.asarray(vol) * 2.0,
                                   atol=1e-5)
        if n_after_first is None:
            n_after_first = traces["n"]   # c_out probe + runner trace
    assert traces["n"] == n_after_first, traces


def test_unflatten_rejects_prefix_ambiguity():
    """A flat dict where one key prefixes another must error, not
    order-dependently clobber a subtree."""
    from smb_vision_tpu.utils.serialization import unflatten_params

    a = np.zeros(2, np.float32)
    with pytest.raises(ValueError, match="ambiguous"):
        unflatten_params({"head": a, "head.bias": a})
    with pytest.raises(ValueError, match="ambiguous"):
        unflatten_params({"head.bias": a, "head": a})
