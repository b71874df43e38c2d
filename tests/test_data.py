"""Data subsystem: NIfTI IO, preprocessing numerics, dataset caching,
loaders."""

import json
import os

import numpy as np
import pytest

from smb_vision_tpu.data.dataset import BatchLoader, CTDataset, partition_items
from smb_vision_tpu.data.load import load_data
from smb_vision_tpu.data.nifti import load_nifti, save_nifti
from smb_vision_tpu.data.preprocess import (
    PreprocessConfig,
    io_orientation,
    preprocess_volume,
    resampled_shape,
    to_ras,
)


def _vol(rng, shape=(32, 28, 20)):
    return rng.normal(0, 300, shape).astype(np.float32)


def test_nifti_roundtrip_gz(tmp_path, rng):
    vol = _vol(rng)
    aff = np.diag([2.0, 1.5, 3.0, 1.0])
    save_nifti(tmp_path / "v.nii.gz", vol, aff)
    img = load_nifti(tmp_path / "v.nii.gz")
    np.testing.assert_array_equal(img.data, vol)
    np.testing.assert_allclose(img.affine[:3, :3], aff[:3, :3], atol=1e-6)
    assert img.spacing == (2.0, 1.5, 3.0)


def test_nifti_int16_scaling(tmp_path, rng):
    vol = (rng.normal(0, 100, (8, 8, 8))).astype(np.int16)
    save_nifti(tmp_path / "v.nii", vol)
    img = load_nifti(tmp_path / "v.nii")
    np.testing.assert_array_equal(img.data, vol)


def test_orientation_identity_is_ras():
    aff = np.eye(4)
    assert io_orientation(aff) == [(0, 1.0), (1, 1.0), (2, 1.0)]


def test_orientation_flip_and_permute(rng):
    # LPS affine (flip x and y) with axes swapped
    data = rng.normal(size=(6, 8, 10)).astype(np.float32)
    aff = np.eye(4)
    aff[0, 0], aff[1, 1] = -1.0, -1.0
    out, new_aff = to_ras(data, aff)
    # x and y flipped
    np.testing.assert_array_equal(out, data[::-1, ::-1, :])
    assert new_aff[0, 0] > 0 and new_aff[1, 1] > 0
    # round trip: to_ras of already-RAS output is identity
    out2, _ = to_ras(out, new_aff)
    np.testing.assert_array_equal(out2, out)


def test_resampled_shape_preserves_extent():
    # 100 voxels @ 1mm -> 2mm spacing = 50 voxels
    assert resampled_shape((100,), (1.0,), (2.0,)) == (50,)
    assert resampled_shape((64, 64, 64), (1.5, 1.5, 3.0),
                           (1.5, 1.5, 3.0)) == (64, 64, 64)


def test_preprocess_window_and_shape(rng):
    vol = np.full((40, 40, 30), -2000.0, np.float32)  # below HU window
    vol[10:30, 10:30, 10:20] = 0.0                     # mid window
    cfg = PreprocessConfig((1.0, 1.0, 1.0), (48, 48, 32))
    out = preprocess_volume(vol, np.eye(4), cfg)
    assert out.shape == (32, 1, 48, 48)               # (D, C, H, W)
    assert out.min() >= 0.0 and out.max() <= 1.0
    assert abs(out[16, 0, 24, 24] - 0.5) < 0.02       # HU 0 -> 0.5


def test_ctdataset_cache_and_corruption(tmp_path, rng):
    vol = _vol(rng)
    save_nifti(tmp_path / "a.nii.gz", vol, np.diag([1., 1., 1., 1.]))
    items = [{"image": str(tmp_path / "a.nii.gz"), "label": 1}]
    cfg = PreprocessConfig((1.0, 1.0, 1.0), (32, 32, 24))
    ds = CTDataset(items=items, pipeline=cfg, cache_dir=tmp_path / "cache")
    first = ds[0]
    assert first["image"].shape == (24, 1, 32, 32)
    assert first["label"] == 1
    caches = list((tmp_path / "cache").glob("*.npy"))
    assert len(caches) == 1
    # cache hit returns identical data
    np.testing.assert_array_equal(ds[0]["image"], first["image"])
    # corrupt the cache -> detect, delete, recompute
    caches[0].write_bytes(b"corrupt")
    np.testing.assert_array_equal(ds[0]["image"], first["image"])


def test_cache_key_ignores_metadata(tmp_path, rng):
    """The cached pixels depend only on (image path, pipeline): a training
    item (labels, split fields) and a bare inference item naming the same
    volume must share ONE cache entry (round-3 fix: the key previously
    hashed the whole item dict, so run_inference re-preprocessed every
    volume run_mim had already cached)."""
    vol = _vol(rng)
    save_nifti(tmp_path / "a.nii.gz", vol, np.diag([1., 1., 1., 1.]))
    img = str(tmp_path / "a.nii.gz")
    cfg = PreprocessConfig((1.0, 1.0, 1.0), (32, 32, 24))
    train_ds = CTDataset(items=[{"image": img, "label": 1, "os": 3.5,
                                 "split": "train"}],
                         pipeline=cfg, cache_dir=tmp_path / "cache")
    first = train_ds[0]["image"]
    infer_ds = CTDataset(items=[{"image": img}], pipeline=cfg,
                         cache_dir=tmp_path / "cache")
    np.testing.assert_array_equal(infer_ds[0]["image"], first)
    assert len(list((tmp_path / "cache").glob("*.npy"))) == 1


def test_ctdataset_float16_cache(tmp_path, rng):
    """cache_dtype='float16' halves the on-disk cache; values stay within
    f16 rounding of the f32 pipeline, are identical between the first
    (compute) epoch and later (reload) epochs, and the dtype participates
    in the cache key (no stale-file reuse after switching)."""
    vol = _vol(rng)
    save_nifti(tmp_path / "a.nii.gz", vol, np.diag([1., 1., 1., 1.]))
    items = [{"image": str(tmp_path / "a.nii.gz")}]
    cfg = PreprocessConfig((1.0, 1.0, 1.0), (32, 32, 24))
    cd = tmp_path / "cache"
    ds32 = CTDataset(items=items, pipeline=cfg, cache_dir=cd)
    ds16 = CTDataset(items=items, pipeline=cfg, cache_dir=cd,
                     cache_dtype="float16")
    a32 = ds32[0]["image"]
    a16_first = ds16[0]["image"]            # compute epoch
    a16_again = ds16[0]["image"]            # cache-hit epoch
    assert a16_first.dtype == np.float32
    np.testing.assert_array_equal(a16_first, a16_again)
    assert np.abs(a16_first - a32).max() < 1e-3
    assert float(np.abs(a16_first - a32).max()) > 0  # f16 really applied
    files = sorted(cd.glob("*.npy"), key=lambda p: p.stat().st_size)
    assert len(files) == 2                  # distinct keys per dtype
    assert files[0].stat().st_size < 0.6 * files[1].stat().st_size


def test_ctdataset_out_dtype_carries_half_precision(tmp_path, rng):
    """out_dtype='float16'/'bfloat16' ships the cache dtype straight
    through (no f32 round trip): dtype as requested, values bit-equal to
    casting the f32 path, identical between compute and reload epochs."""
    import ml_dtypes

    vol = _vol(rng)
    save_nifti(tmp_path / "a.nii.gz", vol, np.diag([1., 1., 1., 1.]))
    items = [{"image": str(tmp_path / "a.nii.gz")}]
    cfg = PreprocessConfig((1.0, 1.0, 1.0), (32, 32, 24))
    cd = tmp_path / "cache"
    ref = CTDataset(items=items, pipeline=cfg, cache_dir=cd,
                    cache_dtype="float16")[0]["image"]     # f32 out path
    for name, dt in (("float16", np.float16),
                     ("bfloat16", ml_dtypes.bfloat16)):
        ds = CTDataset(items=items, pipeline=cfg, cache_dir=cd,
                       cache_dtype="float16", out_dtype=name)
        first = ds[0]["image"]               # compute or cache-hit epoch
        again = ds[0]["image"]               # definitely cache-hit
        assert first.dtype == np.dtype(dt)
        np.testing.assert_array_equal(first, again)
        # same underlying cached f16 values as the f32-out dataset
        np.testing.assert_array_equal(
            first.astype(np.float32),
            ref.astype(np.float16).astype(np.float32)
            if name == "float16" else
            ref.astype(ml_dtypes.bfloat16).astype(np.float32))


def test_load_data_formats(tmp_path):
    rows = [{"image": "a.nii", "label": 0, "split": "train"},
            {"image": "b.nii", "label": 1, "split": "validation"}]
    with open(tmp_path / "d.json", "w") as f:
        json.dump({"train": rows[:1], "validation": rows[1:]}, f)
    assert load_data(tmp_path / "d.json", "train") == rows[:1]

    import pandas as pd

    pd.DataFrame(rows).to_csv(tmp_path / "d.csv", index=False)
    assert len(load_data(tmp_path / "d.csv", "validation")) == 1
    pd.DataFrame(rows).to_parquet(tmp_path / "d.parquet")
    assert len(load_data(tmp_path / "d.parquet", "train")) == 1
    with pytest.raises(ValueError):
        load_data(tmp_path / "d.json", "nope")


def test_partition_items():
    items = list(range(10))
    shards = [partition_items(items, 4, i) for i in range(4)]
    assert all(len(s) == 3 for s in shards)  # padded to even length
    covered = set()
    for s in shards:
        covered.update(s)
    assert covered == set(items)


def test_batchloader_shuffle_and_errors(tmp_path, rng):
    vol = _vol(rng, (16, 16, 12))
    save_nifti(tmp_path / "a.nii.gz", vol)
    items = [{"image": str(tmp_path / "a.nii.gz")} for _ in range(6)]
    cfg = PreprocessConfig((1.0, 1.0, 1.0), (16, 16, 12))
    ds = CTDataset(items=items, pipeline=cfg)
    loader = BatchLoader(ds, 2, shuffle=True, num_workers=2)
    batches = list(loader)
    assert len(batches) == 3
    assert batches[0]["pixel_values"].shape == (2, 12, 1, 16, 16)

    # a failing item propagates (not a silent hang)
    bad = CTDataset(items=[{"image": str(tmp_path / "missing.nii")}],
                    pipeline=cfg)
    bad_loader = BatchLoader(bad, 1, num_workers=1)
    with pytest.raises(Exception):
        list(bad_loader)


def test_device_cached_loader_zero_host_loads_after_epoch0(tmp_path, rng):
    """DeviceCachedBatchLoader pins pixels in device memory on first load:
    epoch >= 1 performs ZERO dataset reads, yields jax Arrays, and matches
    the host BatchLoader's batches value-for-value (same shuffle seed)."""
    import jax

    from smb_vision_tpu.data.dataset import DeviceCachedBatchLoader

    for i in range(4):
        save_nifti(tmp_path / f"v{i}.nii.gz", _vol(rng, (16, 16, 12)))
    items = [{"image": str(tmp_path / f"v{i}.nii.gz")} for i in range(4)]
    cfg = PreprocessConfig((1.0, 1.0, 1.0), (16, 16, 12))
    ds = CTDataset(items=items, pipeline=cfg)
    calls = []
    orig = CTDataset.__getitem__
    ds.__class__ = type("SpyDS", (CTDataset,), {
        "__getitem__": lambda self, i: (calls.append(i), orig(self, i))[1]})

    dev = DeviceCachedBatchLoader(ds, 2, shuffle=True, seed=7)
    host = BatchLoader(ds, 2, shuffle=True, seed=7, num_workers=2)
    for epoch in range(2):
        dev.set_epoch(epoch)
        host.set_epoch(epoch)
        calls.clear()
        got = list(dev)
        if epoch >= 1:
            assert calls == []              # all from device cache
        want = list(host)
        assert len(got) == len(want) == 2
        for g, w in zip(got, want):
            assert isinstance(g["pixel_values"], jax.Array)
            np.testing.assert_allclose(
                np.asarray(g["pixel_values"], dtype=np.float32),
                w["pixel_values"].astype(np.float32), atol=1e-6)

    # label-carrying collates are rejected (pixel-only cache)
    with pytest.raises(ValueError, match="pixel-only"):
        DeviceCachedBatchLoader(ds, 2, collate=lambda ex: {})


def test_orientation_permuted_affine(rng):
    # axes permuted: voxel axis 0 points along world S, axis 2 along world R
    data = rng.normal(size=(5, 7, 9)).astype(np.float32)
    aff = np.zeros((4, 4))
    aff[2, 0] = 2.0    # voxel axis 0 -> +S
    aff[1, 1] = 1.5    # voxel axis 1 -> +A
    aff[0, 2] = -1.0   # voxel axis 2 -> -R
    aff[3, 3] = 1.0
    out, new_aff = to_ras(data, aff)
    # RAS order: (R, A, S) = (flipped axis2, axis1, axis0)
    expected = np.transpose(data, (2, 1, 0))[::-1]
    np.testing.assert_array_equal(out, expected)
    # resulting affine has positive diagonal direction cosines
    for i in range(3):
        assert new_aff[i, i] > 0
    # spacing preserved per world axis
    sp = [np.linalg.norm(new_aff[:3, i]) for i in range(3)]
    np.testing.assert_allclose(sp, [1.0, 1.5, 2.0])


def test_native_permuted_affine_matches_python(tmp_path, rng):
    from smb_vision_tpu.data.native import native_available, native_load_batch

    if not native_available():
        pytest.skip("native loader not built")
    data = rng.normal(0, 300, (20, 24, 28)).astype(np.float32)
    aff = np.zeros((4, 4))
    aff[2, 0] = 2.0
    aff[1, 1] = 1.5
    aff[0, 2] = -1.0
    aff[3, 3] = 1.0
    p = tmp_path / "perm.nii.gz"
    save_nifti(p, data, aff)
    from smb_vision_tpu.data.preprocess import PreprocessConfig, preprocess_volume
    cfg = PreprocessConfig((1.5, 1.5, 1.5), (24, 24, 24))
    nat, status = native_load_batch([str(p)], target_size=cfg.target_size,
                                    target_spacing=cfg.target_spacing)
    assert status == [0]
    img_ref = preprocess_volume(data, aff, cfg)[:, 0].transpose(1, 2, 0)
    np.testing.assert_allclose(nat[0], img_ref, atol=1e-4)


def test_preprocess_volume_full_keeps_extent(rng):
    from smb_vision_tpu.data.preprocess import (
        PreprocessConfig,
        preprocess_volume_full,
    )

    vol = rng.normal(0, 300, (50, 60, 40)).astype(np.float32)
    cfg = PreprocessConfig((2.0, 2.0, 2.0), (999, 999, 999))  # fit unused
    out = preprocess_volume_full(vol, np.eye(4), cfg, pad_multiple=16)
    # resampled extent: 50/2=25->32, 60/2=30->32, 40/2=20->32 (padded)
    assert out.shape == (32, 32, 32)
    assert out.min() >= 0.0 and out.max() <= 1.0
    # padding region is b_min
    assert out[30, 0, 0] == 0.0


# ---------------------------------------------------------------------------
# Golden parity vs the reference preprocessing stack (VERDICT r1 item 5).
# MONAI Spacingd resamples with dst->src = inv(src_aff) @ zoom_affine(aff,
# new_spacing): zoom_affine keeps the translation, so src = dst *
# (out_sp/in_sp), origin-voxel-aligned, sampled by torch grid_sample
# (trilinear, align_corners=False, padding_mode='border'). The goldens here
# build that exact map with torch; monai itself shares torch's grid_sample.
# Reference anchor: /root/reference/src/dataloader/transforms.py:220-314.
# ---------------------------------------------------------------------------

def _torch_spacing_golden(vol, in_spacing, out_spacing):
    """MONAI-Spacingd-equivalent resample via torch grid_sample."""
    import torch
    import torch.nn.functional as F

    from smb_vision_tpu.data.preprocess import resampled_shape

    in_shape = vol.shape
    out_shape = resampled_shape(in_shape, in_spacing, out_spacing)
    coords = []
    for n_in, n_out, si, so in zip(in_shape, out_shape, in_spacing,
                                   out_spacing):
        src = np.arange(n_out, dtype=np.float64) * (so / si)
        # normalize for align_corners=False: x_norm = (2*src + 1)/n - 1
        coords.append((2.0 * src + 1.0) / n_in - 1.0)
    g0, g1, g2 = np.meshgrid(*coords, indexing="ij")
    # grid_sample 5D: input (N,C,D0,D1,D2); grid last dim (x,y,z) indexes
    # (D2, D1, D0)
    grid = np.stack([g2, g1, g0], axis=-1)[None].astype(np.float64)
    t = torch.from_numpy(np.ascontiguousarray(vol, np.float64))[None, None]
    out = F.grid_sample(t, torch.from_numpy(grid), mode="bilinear",
                        padding_mode="border", align_corners=False)
    return out[0, 0].numpy()


def _golden_pipeline(vol, in_spacing, cfg):
    """Full reference chain in numpy/torch: Spacingd -> ScaleIntensityRanged
    -> SpatialPadd -> CenterSpatialCropd (MONAI conventions)."""
    out = _torch_spacing_golden(vol, in_spacing, cfg.target_spacing)
    a_min, a_max = cfg.hu_window
    b_min, b_max = cfg.out_range
    out = (out - a_min) / (a_max - a_min) * (b_max - b_min) + b_min
    out = np.clip(out, b_min, b_max)
    pads = []
    for cur, tgt in zip(out.shape, cfg.target_size):
        extra = max(tgt - cur, 0)
        pads.append((extra // 2, extra - extra // 2))
    out = np.pad(out, pads, constant_values=b_min)
    slices = []
    for cur, tgt in zip(out.shape, cfg.target_size):
        start = max(cur // 2 - tgt // 2, 0)
        slices.append(slice(start, start + tgt))
    return out[tuple(slices)]


GOLDEN_CASES = [
    # (in_shape, in_spacing, target_spacing, target_size)  up/down/aniso
    ((40, 37, 29), (0.7, 0.7, 2.5), (1.5, 1.5, 3.0), (24, 24, 16)),
    ((24, 24, 24), (2.0, 2.0, 2.0), (1.0, 1.0, 1.5), (40, 40, 32)),
    ((33, 41, 22), (0.9765625, 0.9765625, 5.0), (1.5, 1.5, 3.0),
     (24, 24, 40)),
    ((16, 16, 16), (1.5, 1.5, 3.0), (1.5, 1.5, 3.0), (16, 16, 16)),
]


def test_preprocess_matches_torch_monai_goldens(rng):
    from smb_vision_tpu.data.preprocess import (
        PreprocessConfig,
        preprocess_volume,
    )

    max_dev = 0.0
    for in_shape, in_sp, tgt_sp, tgt_sz in GOLDEN_CASES:
        vol = rng.normal(0, 300, in_shape).astype(np.float32)
        cfg = PreprocessConfig(tgt_sp, tgt_sz, layout="CHWD")
        golden = _golden_pipeline(vol.astype(np.float64), in_sp, cfg)
        aff = np.diag(list(in_sp) + [1.0])
        ours = preprocess_volume(vol, aff, cfg)[0]  # (H, W, D)
        dev = np.abs(ours - golden).max()
        max_dev = max(max_dev, dev)
        assert dev < 1e-3, (in_shape, in_sp, dev)
    # documented in PARITY.md
    assert max_dev < 1e-3


def test_preprocess_golden_with_orientation(rng):
    """Full chain incl. RAS reorientation: a PIL-ish (flipped/permuted)
    affine; the golden applies the hand-written inverse permutation before
    the torch resample."""
    from smb_vision_tpu.data.preprocess import (
        PreprocessConfig,
        preprocess_volume,
    )

    vol = rng.normal(0, 300, (30, 26, 22)).astype(np.float32)
    # affine: input axes (y, z, x) with x flipped -> world (R, A, S)
    # column i = world direction of input axis i
    sp = (1.2, 0.8, 2.4)
    aff = np.zeros((4, 4))
    aff[3, 3] = 1.0
    aff[0, 2] = -sp[2]    # input axis 2 -> -R
    aff[1, 0] = sp[0]     # input axis 0 -> +A
    aff[2, 1] = sp[1]     # input axis 1 -> +S
    aff[:3, 3] = (10.0, -4.0, 2.0)

    # hand-written RAS: axes order (2, 0, 1) with axis 2 flipped
    ras = np.transpose(vol, (2, 0, 1))[::-1]
    ras_sp = (sp[2], sp[0], sp[1])
    cfg = PreprocessConfig((1.5, 1.5, 3.0), (20, 20, 12), layout="CHWD")
    golden = _golden_pipeline(np.ascontiguousarray(ras, np.float64),
                              ras_sp, cfg)
    ours = preprocess_volume(vol, aff, cfg)[0]
    assert np.abs(ours - golden).max() < 1e-3


def test_native_loader_matches_torch_goldens(tmp_path, rng):
    from smb_vision_tpu.data.native import native_available, native_load_batch
    from smb_vision_tpu.data.preprocess import PreprocessConfig

    if not native_available():
        pytest.skip("native loader not built")
    in_shape, in_sp = (40, 37, 29), (0.7, 0.7, 2.5)
    cfg = PreprocessConfig((1.5, 1.5, 3.0), (24, 24, 16), layout="CHWD")
    vol = rng.normal(0, 300, in_shape).astype(np.float32)
    p = tmp_path / "g.nii.gz"
    save_nifti(p, vol, np.diag(list(in_sp) + [1.0]))
    golden = _golden_pipeline(vol.astype(np.float64), in_sp, cfg)
    nat, status = native_load_batch(
        [str(p)], target_size=cfg.target_size,
        target_spacing=cfg.target_spacing, hu_window=cfg.hu_window,
        out_range=cfg.out_range)
    assert status[0] == 0
    assert np.abs(nat[0] - golden).max() < 1e-3


def test_preprocess_bucketed_matches_exact(rng):
    """bucket= path (one compile per input bucket) is numerically identical
    to the exact-shape path and to the torch goldens."""
    from smb_vision_tpu.data.preprocess import (
        PreprocessConfig,
        preprocess_volume,
    )

    cfg = PreprocessConfig((1.5, 1.5, 3.0), (24, 24, 16), layout="CHWD")
    for in_shape, in_sp in [((40, 37, 29), (0.7, 0.7, 2.5)),
                            ((33, 41, 22), (1.1, 0.9, 4.0)),
                            ((24, 24, 24), (2.0, 2.0, 2.0))]:
        vol = rng.normal(0, 300, in_shape).astype(np.float32)
        aff = np.diag(list(in_sp) + [1.0])
        exact = preprocess_volume(vol, aff, cfg)
        bucketed = preprocess_volume(vol, aff, cfg, bucket=16)
        np.testing.assert_allclose(bucketed, exact, atol=2e-5, rtol=1e-5)
        golden = _golden_pipeline(vol.astype(np.float64), in_sp, cfg)
        assert np.abs(bucketed[0] - golden).max() < 1e-3


def test_preprocess_bucketed_compile_count(rng):
    """Distinct geometries inside one bucket share a single compilation."""
    import jax

    from smb_vision_tpu.data.preprocess import (
        PreprocessConfig,
        _device_fit_dynamic,
        preprocess_volume,
    )

    cfg = PreprocessConfig((1.5, 1.5, 3.0), (24, 24, 16), layout="CHWD")
    _device_fit_dynamic._clear_cache()
    for shape, sp in [((30, 30, 20), (1.0, 1.0, 2.0)),
                      ((25, 28, 30), (0.8, 1.2, 2.5)),
                      ((32, 32, 32), (1.5, 1.5, 3.0))]:
        vol = rng.normal(0, 300, shape).astype(np.float32)
        preprocess_volume(vol, np.diag(list(sp) + [1.0]), cfg, bucket=32)
    assert _device_fit_dynamic._cache_size() == 1
