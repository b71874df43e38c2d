"""Native C++ CT loader (csrc/ctloader.cpp) vs the Python/JAX pipeline."""

import os

import numpy as np
import pytest

from smb_vision_tpu.data.native import native_available, native_load_batch
from smb_vision_tpu.data.nifti import save_nifti
from smb_vision_tpu.data.preprocess import (
    PreprocessConfig,
    preprocess_volume,
)

pytestmark = pytest.mark.skipif(not native_available(),
                                reason="native loader not built")


def _case(tmp_path, rng, shape=(50, 44, 36), spacing=(2.0, 1.5, 3.0),
          name="v.nii.gz"):
    vol = rng.normal(0, 300, shape).astype(np.float32)
    aff = np.diag([*spacing, 1.0])
    p = tmp_path / name
    save_nifti(p, vol, aff)
    return vol, aff, str(p)


def test_native_matches_python_pipeline(tmp_path, rng):
    vol, aff, p = _case(tmp_path, rng)
    cfg = PreprocessConfig((1.0, 1.0, 1.0), (64, 56, 48))
    nat, status = native_load_batch(
        [p], target_size=cfg.target_size, target_spacing=cfg.target_spacing)
    assert status == [0]
    ref = preprocess_volume(vol, aff, cfg)[:, 0].transpose(1, 2, 0)
    np.testing.assert_allclose(nat[0], ref, atol=1e-4)


def test_native_flipped_orientation(tmp_path, rng):
    # LPS-style affine: flip x and y; native must reorient identically
    vol = rng.normal(0, 300, (30, 28, 20)).astype(np.float32)
    aff = np.diag([-1.5, -2.0, 2.5, 1.0])
    p = tmp_path / "flip.nii.gz"
    save_nifti(p, vol, aff)
    cfg = PreprocessConfig((1.5, 1.5, 1.5), (32, 32, 32))
    nat, status = native_load_batch(
        [p], target_size=cfg.target_size, target_spacing=cfg.target_spacing)
    assert status == [0]
    ref = preprocess_volume(vol, aff, cfg)[:, 0].transpose(1, 2, 0)
    np.testing.assert_allclose(nat[0], ref, atol=1e-4)


def test_native_int16_and_uncompressed(tmp_path, rng):
    vol = rng.normal(0, 200, (24, 24, 16)).astype(np.int16)
    p = tmp_path / "i16.nii"
    save_nifti(p, vol, np.eye(4))
    cfg = PreprocessConfig((1.0, 1.0, 1.0), (24, 24, 16))
    nat, status = native_load_batch(
        [str(p)], target_size=cfg.target_size,
        target_spacing=cfg.target_spacing)
    assert status == [0]
    ref = preprocess_volume(vol.astype(np.float32), np.eye(4),
                            cfg)[:, 0].transpose(1, 2, 0)
    np.testing.assert_allclose(nat[0], ref, atol=1e-4)


def test_native_error_statuses(tmp_path, rng):
    _, _, good = _case(tmp_path, rng)
    missing = str(tmp_path / "missing.nii")
    garbage = tmp_path / "garbage.nii"
    garbage.write_bytes(b"\x00" * 500)
    cfg = PreprocessConfig((1.0, 1.0, 1.0), (16, 16, 16))
    _, status = native_load_batch(
        [good, missing, str(garbage)], target_size=cfg.target_size,
        target_spacing=cfg.target_spacing)
    assert status[0] == 0 and status[1] != 0 and status[2] != 0


def test_native_batch_concurrency(tmp_path, rng):
    paths = [_case(tmp_path, rng, name=f"v{i}.nii.gz")[2] for i in range(8)]
    cfg = PreprocessConfig((1.0, 1.0, 1.0), (32, 32, 32))
    out, status = native_load_batch(
        paths, target_size=cfg.target_size,
        target_spacing=cfg.target_spacing, num_threads=8)
    assert status == [0] * 8
    assert out.shape == (8, 32, 32, 32)
    assert np.isfinite(out).all()


def test_ctdataset_native_backend(tmp_path, rng):
    from smb_vision_tpu.data.dataset import CTDataset

    vol, aff, p = _case(tmp_path, rng)
    cfg = PreprocessConfig((1.5, 1.5, 1.5), (32, 32, 24))
    ds_nat = CTDataset(items=[{"image": p}], pipeline=cfg, backend="native")
    ds_py = CTDataset(items=[{"image": p}], pipeline=cfg, backend="python")
    np.testing.assert_allclose(ds_nat[0]["image"], ds_py[0]["image"],
                               atol=1e-4)


def test_native_rejects_zero_dim_header(tmp_path, rng):
    """dim[i]==0 passed the truncation check (nspatial==0) and reached the
    resampler with negative clamped indices -> OOB read. Must be a clean
    per-item error status instead."""
    vol = rng.normal(0, 100, (8, 8, 8)).astype(np.float32)
    p = tmp_path / "zdim.nii"
    save_nifti(p, vol, np.eye(4))
    raw = bytearray(p.read_bytes())
    import struct
    struct.pack_into("<h", raw, 42, 0)      # dim[1] = 0
    p.write_bytes(bytes(raw))
    nat, status = native_load_batch([str(p)], target_size=(8, 8, 8),
                                    target_spacing=(1.0, 1.0, 1.0))
    assert status[0] != 0


def test_native_nan_scl_slope_ignored(tmp_path, rng):
    """NaN scl_slope bytes (uninitialized headers in the wild) must not
    turn the volume into NaN — spec says non-finite/zero slope = no
    scaling."""
    vol = rng.normal(0, 100, (12, 12, 8)).astype(np.float32)
    p = tmp_path / "nans.nii"
    save_nifti(p, vol, np.eye(4))
    raw = bytearray(p.read_bytes())
    import struct
    struct.pack_into("<f", raw, 112, float("nan"))   # scl_slope
    struct.pack_into("<f", raw, 116, 5.0)            # scl_inter
    p.write_bytes(bytes(raw))
    nat, status = native_load_batch([str(p)], target_size=(12, 12, 8),
                                    target_spacing=(1.0, 1.0, 1.0))
    assert status == [0]
    assert np.isfinite(nat[0]).all()

    # the python loader must agree
    from smb_vision_tpu.data.nifti import load_nifti
    img = load_nifti(p)
    assert np.isfinite(img.data).all()
    np.testing.assert_array_equal(img.data, vol)


def test_native_uint32_datatype(tmp_path, rng):
    """datatype 768 (uint32) is in the Python loader's table and must load
    on the native backend too (the default backend has no per-file python
    fallback)."""
    vol = rng.integers(0, 2000, (16, 16, 12)).astype(np.int32)
    p = tmp_path / "u32.nii"
    save_nifti(p, vol, np.eye(4))
    raw = bytearray(p.read_bytes())
    import struct
    struct.pack_into("<h", raw, 70, 768)     # datatype: int32 -> uint32
    p.write_bytes(bytes(raw))                # (same bytes for 0..2000)
    nat, status = native_load_batch([str(p)], target_size=(16, 16, 12),
                                    target_spacing=(1.0, 1.0, 1.0))
    assert status == [0]
    assert np.isfinite(nat[0]).all()

    from smb_vision_tpu.data.nifti import load_nifti
    np.testing.assert_array_equal(load_nifti(p).data.astype(np.int64),
                                  vol.astype(np.int64))
