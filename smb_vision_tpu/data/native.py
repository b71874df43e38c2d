"""ctypes binding for the native C++ CT loader (csrc/ctloader.cpp).

`native_load_batch(paths, pipeline)` decodes + reorients + resamples +
windows + fits N NIfTI volumes concurrently on a C++ thread pool (GIL-free),
returning a (N, t0, t1, t2) float32 array in RAS order. This is the
first-party replacement for the reference's MONAI/ITK decode + torch
DataLoader worker pool (SURVEY §2b). Falls back gracefully when the shared
library hasn't been built (scripts/build_native.py).
"""

from __future__ import annotations

import ctypes
import os
from pathlib import Path
from typing import List, Optional, Sequence, Tuple

import numpy as np

# SMB_CTLOADER_LIB selects an alternate build in _native/ (e.g.
# libctloader_asan.so from `build_native.py --sanitize` for fuzz runs)
_LIB_PATH = (Path(__file__).parent / "_native"
             / os.environ.get("SMB_CTLOADER_LIB", "libctloader.so"))
_lib = None


def _load_lib():
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB_PATH.exists():
        # try building on demand (g++ is in the image)
        try:
            import scripts.build_native  # type: ignore
            scripts.build_native.build(verbose=False)
        except Exception:
            import subprocess
            import sys

            root = Path(__file__).resolve().parents[2]
            build = root / "scripts" / "build_native.py"
            if build.exists():
                try:
                    subprocess.run([sys.executable, str(build)], check=True,
                                   capture_output=True)
                except subprocess.CalledProcessError:
                    pass
    if not _LIB_PATH.exists():
        raise FileNotFoundError(
            f"{_LIB_PATH} not built; run scripts/build_native.py")
    lib = ctypes.CDLL(str(_LIB_PATH))
    lib.ctloader_load_batch.restype = ctypes.c_int
    lib.ctloader_load_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int,
        ctypes.c_int64, ctypes.c_int64, ctypes.c_int64,
        ctypes.c_double, ctypes.c_double, ctypes.c_double,
        ctypes.c_float, ctypes.c_float, ctypes.c_float, ctypes.c_float,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float), ctypes.POINTER(ctypes.c_int),
    ]
    lib.ctloader_version.restype = ctypes.c_int
    _lib = lib
    return lib


def native_available() -> bool:
    try:
        return _load_lib().ctloader_version() >= 1
    except (FileNotFoundError, OSError):
        return False


def native_load_batch(paths: Sequence[str], *,
                      target_size: Tuple[int, int, int],
                      target_spacing: Tuple[float, float, float],
                      hu_window: Tuple[float, float] = (-1000.0, 1000.0),
                      out_range: Tuple[float, float] = (0.0, 1.0),
                      num_threads: int = 8
                      ) -> Tuple[np.ndarray, List[int]]:
    """Returns (volumes (N, H, W, D) float32 RAS, per-item status list;
    status 0 = ok). target_size/spacing in RAS (H, W, D) order to match
    data/preprocess.py."""
    lib = _load_lib()
    n = len(paths)
    t0, t1, t2 = target_size
    out = np.empty((n, t0, t1, t2), dtype=np.float32)
    status = np.empty(n, dtype=np.int32)
    arr = (ctypes.c_char_p * n)(*[str(p).encode() for p in paths])
    ret = lib.ctloader_load_batch(
        arr, n, t0, t1, t2,
        float(target_spacing[0]), float(target_spacing[1]),
        float(target_spacing[2]),
        float(hu_window[0]), float(hu_window[1]),
        float(out_range[0]), float(out_range[1]),
        int(num_threads),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
        status.ctypes.data_as(ctypes.POINTER(ctypes.c_int)))
    if ret != 0:
        raise RuntimeError(f"ctloader_load_batch failed: {ret}")
    return out, status.tolist()


def native_preprocess_volume(path: str, pipeline) -> Optional[np.ndarray]:
    """One volume through the native path, returned in the pipeline's model
    layout (DCHW or CHWD) like data.preprocess.preprocess_volume."""
    from smb_vision_tpu.data.preprocess import CT_PIPELINES

    cfg = CT_PIPELINES[pipeline] if isinstance(pipeline, str) else pipeline
    vols, status = native_load_batch(
        [path], target_size=cfg.target_size,
        target_spacing=cfg.target_spacing, hu_window=cfg.hu_window,
        out_range=cfg.out_range, num_threads=1)
    if status[0] != 0:
        raise ValueError(f"native decode failed ({status[0]}) for {path}")
    out = vols[0]
    if cfg.layout == "DCHW":
        return np.ascontiguousarray(out.transpose(2, 0, 1))[:, None]
    return out[None]
