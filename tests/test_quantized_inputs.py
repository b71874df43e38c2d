"""uint8 pixel shipping (data/quantization.py): per-volume affine codes
decoded on device inside the compiled step. Transfer-bytes path: CTDataset
out_dtype='uint8' -> collate pixel_scale/pixel_offset -> Trainer dequant
wrap (input_dtype='uint8')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from smb_vision_tpu.data.quantization import (
    OFFSET_KEY,
    SCALE_KEY,
    dequantize_batch,
    dequantize_pixels,
    dequantize_volume,
    quantize_batch,
    quantize_volume,
)


def test_quantize_roundtrip_bound():
    rng = np.random.default_rng(0)
    vol = rng.uniform(-3.0, 2.0, (20, 1, 17, 17)).astype(np.float32)
    q, s, o = quantize_volume(vol)
    assert q.dtype == np.uint8
    back = dequantize_volume(q, s, o)
    # |err| <= scale/2 per voxel, the affine-quantization bound
    assert np.abs(back - vol).max() <= float(s) / 2 + 1e-6
    # f16 sources (the half-precision cache) quantize identically
    q16, s16, o16 = quantize_volume(vol.astype(np.float16))
    assert np.abs(dequantize_volume(q16, s16, o16) - vol).max() <= (
        float(s16) / 2 + 2e-3)


def test_quantize_constant_volume():
    q, s, o = quantize_volume(np.full((4, 6), 3.25, np.float32))
    assert np.all(q == 0)
    assert np.all(dequantize_volume(q, s, o) == 3.25)


def test_dequantize_pixels_broadcasts_prefix_scales():
    """Scales of any prefix shape (B,) or (accum, micro) broadcast over
    the trailing pixel dims — the host-pre-split grad-accum layout."""
    rng = np.random.default_rng(1)
    q = rng.integers(0, 256, (2, 3, 4, 5)).astype(np.uint8)
    s = rng.uniform(0.5, 2.0, (2, 3)).astype(np.float32)
    o = rng.uniform(-1.0, 1.0, (2, 3)).astype(np.float32)
    out = np.asarray(dequantize_pixels(
        jnp.asarray(q), jnp.asarray(s), jnp.asarray(o)))
    ref = q.astype(np.float32) * s[..., None, None] + o[..., None, None]
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_dequantize_batch_noop_on_float_and_decodes_u8():
    b = {"pixel_values": jnp.ones((2, 4))}
    assert dequantize_batch(b) is b
    vol = np.linspace(0, 1, 32, dtype=np.float32).reshape(2, 16)
    qb = quantize_batch({"pixel_values": vol, "labels": np.asarray([1, 0])})
    assert qb["pixel_values"].dtype == np.uint8
    dec = jax.jit(lambda x: dequantize_batch(x, jnp.float32))(qb)
    assert SCALE_KEY not in dec and OFFSET_KEY not in dec
    assert "labels" in dec
    assert np.abs(np.asarray(dec["pixel_values"]) - vol).max() < 3e-3
    # u8 pixels without the affine keys is a hard error, not garbage
    with pytest.raises(ValueError, match="pixel_scale"):
        dequantize_batch({"pixel_values": qb["pixel_values"]})


def test_ctdataset_uint8_cache_and_shipping(tmp_path):
    """cache_dtype='uint8' stores codes+affine (npz) once; out_dtype='uint8'
    ships them with per-item scale keys; epoch-1 values match the reload
    (no per-epoch drift); float consumers decode from the same cache."""
    from smb_vision_tpu.data.dataset import (
        BatchLoader,
        CTDataset,
    )
    from smb_vision_tpu.data.nifti import save_nifti
    from smb_vision_tpu.data.preprocess import PreprocessConfig

    rng = np.random.default_rng(2)
    for i in range(2):
        save_nifti(tmp_path / f"v{i}.nii.gz",
                   rng.uniform(-800, 900, (12, 12, 8)).astype(np.float32))
    items = [{"image": str(tmp_path / f"v{i}.nii.gz")} for i in range(2)]
    pipe = PreprocessConfig((1., 1., 1.), (12, 12, 8))
    ds = CTDataset(items=items, pipeline=pipe, cache_dir=str(tmp_path / "c"),
                   cache_dtype="uint8", out_dtype="uint8")
    ex_first = ds[0]                      # computes + writes cache
    assert ex_first["image"].dtype == np.uint8
    assert "image_scale" in ex_first and "image_offset" in ex_first
    ex_again = ds[0]                      # reads cache
    np.testing.assert_array_equal(ex_first["image"], ex_again["image"])
    assert ex_first["image_scale"] == ex_again["image_scale"]

    # float reader over the SAME uint8 cache decodes within the bound
    ds_f = CTDataset(items=items, pipeline=pipe,
                     cache_dir=str(tmp_path / "c"),
                     cache_dtype="uint8", out_dtype="float32")
    exf = ds_f[0]
    assert exf["image"].dtype == np.float32
    back = dequantize_volume(ex_first["image"], ex_first["image_scale"],
                             ex_first["image_offset"])
    np.testing.assert_allclose(exf["image"], back)
    # load_volume keeps its float contract on a uint8-out dataset
    assert ds.load_volume(items[0]).dtype == np.float32

    # corrupt cache entry: detected and recomputed, not crashed
    path = ds._cache_path(items[0])
    path.write_bytes(b"garbage")
    ex_rec = ds[0]
    np.testing.assert_array_equal(ex_rec["image"], ex_first["image"])

    # collate carries the affine as per-sample batch keys
    batch = next(iter(BatchLoader(ds, batch_size=2, drop_last=False)))
    assert batch["pixel_values"].dtype == np.uint8
    assert batch[SCALE_KEY].shape == (2,)
    assert batch[OFFSET_KEY].dtype == np.float32


def test_ctdataset_float_cache_uint8_out(tmp_path):
    """out_dtype='uint8' over an existing float16 cache quantizes at load
    (no cache invalidation needed to switch shipping modes)."""
    from smb_vision_tpu.data.dataset import CTDataset
    from smb_vision_tpu.data.nifti import save_nifti
    from smb_vision_tpu.data.preprocess import PreprocessConfig

    rng = np.random.default_rng(3)
    save_nifti(tmp_path / "v.nii.gz",
               rng.uniform(-500, 500, (10, 10, 6)).astype(np.float32))
    items = [{"image": str(tmp_path / "v.nii.gz")}]
    pipe = PreprocessConfig((1., 1., 1.), (10, 10, 6))
    kw = dict(items=items, pipeline=pipe, cache_dir=str(tmp_path / "c"),
              cache_dtype="float16")
    ref = CTDataset(out_dtype="float32", **kw)[0]["image"]
    ex = CTDataset(out_dtype="uint8", **kw)[0]
    assert ex["image"].dtype == np.uint8
    back = dequantize_volume(ex["image"], ex["image_scale"],
                             ex["image_offset"])
    assert np.abs(back - ref).max() <= float(ex["image_scale"]) / 2 + 2e-3


def test_trainer_uint8_shipping_end_to_end(tmp_path):
    """input_dtype='uint8': the Trainer decodes inside the jitted step
    (workload sees bf16 pixels, no affine keys) and the MIM loss tracks
    the f32 run within quantization noise."""
    import optax

    from smb_vision_tpu.data.dataset import BatchLoader, CTDataset
    from smb_vision_tpu.data.nifti import save_nifti
    from smb_vision_tpu.data.preprocess import PreprocessConfig
    from smb_vision_tpu.models.configs import VideoMAEConfig
    from smb_vision_tpu.train.mim import make_mim_workload
    from smb_vision_tpu.train.trainer import Trainer, TrainingArguments

    rng = np.random.default_rng(4)
    for i in range(8):
        save_nifti(tmp_path / f"v{i}.nii.gz",
                   rng.uniform(-700, 700, (16, 16, 16)).astype(np.float32))
    items = [{"image": str(tmp_path / f"v{i}.nii.gz")} for i in range(8)]
    pipe = PreprocessConfig((1., 1., 1.), (16, 16, 16))
    cfg = VideoMAEConfig(image_size=16, num_frames=16, num_channels=1,
                         patch_size=8, tubelet_size=8, hidden_size=32,
                         num_hidden_layers=1, num_attention_heads=2,
                         intermediate_size=64, decoder_hidden_size=32,
                         decoder_num_hidden_layers=1,
                         decoder_num_attention_heads=2,
                         decoder_intermediate_size=64,
                         dtype="float32", attn_impl="xla")
    seen = {}

    def run(out_dtype, input_dtype, outdir):
        tx = optax.sgd(0.0)            # loss probe: no param movement
        model, init_fn, step_fn, eval_fn = make_mim_workload(
            cfg, mask_patch_size=8, mask_ratio=0.5, tx=tx)

        def spy_step(state, batch, key):
            seen[input_dtype] = (batch["pixel_values"].dtype,
                                 SCALE_KEY in batch)
            return step_fn(state, batch, key)

        ds = CTDataset(items=items, pipeline=pipe,
                       cache_dir=str(tmp_path / f"c_{out_dtype}"),
                       cache_dtype=out_dtype if out_dtype == "uint8"
                       else "float32",
                       out_dtype=out_dtype)
        loader = BatchLoader(ds, batch_size=8, shuffle=False)
        args = TrainingArguments(output_dir=str(tmp_path / outdir),
                                 num_train_steps=2, logging_steps=1,
                                 save_steps=100, input_dtype=input_dtype)
        tr = Trainer(args=args, state=init_fn(jax.random.PRNGKey(0)),
                     step_fn=spy_step, train_loader=loader)
        tr.train()
        import json
        rows = [json.loads(line) for line in
                (tmp_path / outdir / "metrics.jsonl").read_text()
                .splitlines()]
        return [r["loss"] for r in rows if "loss" in r]

    losses_f32 = run("float32", "float32", "o_f32")
    losses_u8 = run("uint8", "uint8", "o_u8")
    # the workload saw decoded bf16 pixels, not codes
    assert seen["uint8"] == (jnp.bfloat16, False)
    assert seen["float32"] == (jnp.float32, False)
    for lf, lu in zip(losses_f32, losses_u8):
        assert abs(lf - lu) / max(abs(lf), 1e-9) < 0.05, (losses_f32,
                                                          losses_u8)


def test_trainer_uint8_accum_presplit(tmp_path):
    """uint8 + host grad-accum pre-split: the (accum, micro) affine keys
    survive presplit and decode per microbatch row."""
    from smb_vision_tpu.train.trainer import Trainer, TrainingArguments

    class ListLoader:
        def __init__(self, batches):
            self.batches = batches
            self.ds = list(range(8))

        def __iter__(self):
            return iter(self.batches)

        def __len__(self):
            return len(self.batches)

        def set_epoch(self, e):
            pass

    rng = np.random.default_rng(5)
    base = rng.uniform(0, 1, (16, 4)).astype(np.float32)
    batches = [{"pixel_values": base}]
    seen = {}

    def step_fn(state, batch, key):
        px = batch["pixel_values"]
        seen["dtype"] = px.dtype
        seen["shape"] = px.shape
        seen["has_scale"] = SCALE_KEY in batch
        return {**state, "step": state["step"] + 1}, {
            "loss": jnp.mean(px.astype(jnp.float32))}

    args = TrainingArguments(output_dir=str(tmp_path), num_train_steps=1,
                             gradient_accumulation_steps=2,
                             input_dtype="uint8", logging_steps=1,
                             save_steps=100)
    tr = Trainer(args=args,
                 state={"params": {}, "opt_state": (),
                        "step": jnp.asarray(0)},
                 step_fn=step_fn, train_loader=ListLoader(batches))
    tr.train()
    assert seen["dtype"] == jnp.bfloat16
    assert seen["shape"] == (2, 8, 4)          # (accum, micro, features)
    assert not seen["has_scale"]
    import json
    rows = [json.loads(line) for line in
            (tmp_path / "metrics.jsonl").read_text().splitlines()]
    loss = next(r["loss"] for r in rows if "loss" in r)
    # decoded values match the float source within quantization noise
    assert abs(loss - base.mean()) < 1e-2


def test_device_cached_loader_uint8(tmp_path):
    """DeviceCachedBatchLoader pins uint8 codes (half the bf16 HBM) and
    yields device batches with affine keys for the in-step decode."""
    from smb_vision_tpu.data.dataset import (
        CTDataset,
        DeviceCachedBatchLoader,
    )
    from smb_vision_tpu.data.nifti import save_nifti
    from smb_vision_tpu.data.preprocess import PreprocessConfig
    from smb_vision_tpu.train.trainer import Trainer, TrainingArguments

    rng = np.random.default_rng(6)
    for i in range(8):
        save_nifti(tmp_path / f"v{i}.nii.gz",
                   rng.uniform(-600, 600, (12, 12, 8)).astype(np.float32))
    items = [{"image": str(tmp_path / f"v{i}.nii.gz")} for i in range(8)]
    ds = CTDataset(items=items,
                   pipeline=PreprocessConfig((1., 1., 1.), (12, 12, 8)),
                   out_dtype="uint8")
    loader = DeviceCachedBatchLoader(ds, 8, shuffle=True,
                                     input_dtype="uint8")
    seen = {}

    def step_fn(state, batch, key):
        seen["dtype"] = batch["pixel_values"].dtype
        seen["has_scale"] = SCALE_KEY in batch
        loss = jnp.mean(batch["pixel_values"] ** 2)
        return {**state, "step": state["step"] + 1}, {"loss": loss}

    args = TrainingArguments(output_dir=str(tmp_path / "out"),
                             num_train_steps=2, input_dtype="uint8",
                             logging_steps=1, save_steps=100)
    tr = Trainer(args=args, state={"params": {}, "opt_state": (),
                                   "step": jnp.asarray(0)},
                 step_fn=step_fn, train_loader=loader)
    tr.train()
    assert seen["dtype"] == jnp.bfloat16      # decoded inside the step
    assert not seen["has_scale"]
    # the pinned cache holds uint8 codes, not floats
    pinned = next(iter(loader._dev.values()))
    assert pinned[0].dtype == jnp.uint8
    assert len(pinned) == 3


def test_run_inference_uint8_cli(tmp_path):
    """run_inference --input_dtype uint8: pixels ship as codes + affine,
    decode inside the compiled encoder, embeddings match the f32 run
    within quantization noise."""
    from smb_vision_tpu.cli.run_inference import main as run_inference
    from smb_vision_tpu.data.nifti import save_nifti

    import dataclasses
    import json

    from smb_vision_tpu.models.configs import VideoMAEConfig

    rng = np.random.default_rng(7)
    for i in range(3):
        save_nifti(tmp_path / f"case_{i}.nii.gz",
                   rng.normal(0, 300, (32, 32, 32)).astype(np.int16),
                   np.diag([1.5, 1.5, 3.0, 1.0]))
    cfg = VideoMAEConfig(image_size=32, num_frames=32, num_channels=1,
                         patch_size=16, tubelet_size=16, hidden_size=32,
                         num_hidden_layers=1, num_attention_heads=2,
                         intermediate_size=64, dtype="float32",
                         attn_impl="xla")
    (tmp_path / "config.json").write_text(
        json.dumps(dataclasses.asdict(cfg)))
    common = [
        "--data_dir", str(tmp_path),
        "--config_path", str(tmp_path / "config.json"),
        "--dtype", "float32", "--attn_impl", "xla",
        "--batch_size", "2",
    ]
    run_inference(common + ["--output_dir", str(tmp_path / "f32")])
    run_inference(common + ["--output_dir", str(tmp_path / "u8"),
                            "--input_dtype", "uint8",
                            "--cache_data_dir", str(tmp_path / "c_u8"),
                            "--cache_dtype", "uint8"])
    names = sorted(p.name for p in (tmp_path / "f32").glob("*.npy"))
    assert len(names) == 3
    for n in names:
        ref = np.load(tmp_path / "f32" / n)
        got = np.load(tmp_path / "u8" / n)
        rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-6)
        assert rel < 0.05, (n, rel)
