"""Synthetic dataset generator — the fixture factory for tests and CLI
smoke runs (role of reference scripts/preprocess/create_dummy_data.py:
structured random NIfTI volumes + labels (histology/age/sex), survival
fields (os/os_event), train/val/test splits, JSON + parquet outputs).

Usage:
    python scripts/create_dummy_data.py --out /tmp/dummy --num 8 --size 64
"""

from __future__ import annotations

import argparse
import json
from pathlib import Path

import numpy as np


def make_volume(rng: np.random.Generator, size: int, depth: int
                ) -> np.ndarray:
    """A CT-ish volume in HU: air background, soft-tissue ellipsoid body,
    a few random dense 'lesions'.

    Computed in z-chunks of f32: full-volume float64 meshgrids are
    pathologically slow on small single-core hosts (multi-GB working
    sets), while slice-sized f32 ops run at normal speed.
    """
    h = w = size
    yy = np.linspace(-1, 1, h, dtype=np.float32)[:, None, None]
    xx = np.linspace(-1, 1, w, dtype=np.float32)[None, :, None]
    zline = np.linspace(-1, 1, depth, dtype=np.float32)
    plane = (yy / 0.7) ** 2 + (xx / 0.8) ** 2          # (h, w, 1)
    lesions = [(rng.uniform(-0.5, 0.5, 3).astype(np.float32),
                np.float32(rng.uniform(0.05, 0.2)))
               for _ in range(rng.integers(2, 6))]
    vol = np.empty((h, w, depth), np.float32)
    step = max(1, (1 << 24) // (h * w))                # ~16M voxel chunks
    for z0 in range(0, depth, step):
        zz = zline[z0:z0 + step][None, None, :]        # (1, 1, cz)
        cz = zz.shape[-1]
        body = plane + (zz / 0.95) ** 2 < 1.0          # (h, w, cz)
        chunk = np.full((h, w, cz), -1000.0, np.float32)
        n = int(body.sum())
        chunk[body] = rng.standard_normal(n, dtype=np.float32) * 20 + 40
        for c, r in lesions:
            lesion = body & ((xx - c[0]) ** 2 + (yy - c[1]) ** 2
                             + (zz - c[2]) ** 2 < r * r)
            n = int(lesion.sum())
            if n:
                chunk[lesion] = (rng.standard_normal(n, dtype=np.float32)
                                 * 60 + 300)
        vol[:, :, z0:z0 + step] = chunk
    return vol


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--num", type=int, default=8)
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--depth", type=int, default=None)
    ap.add_argument("--spacing", type=float, nargs=3,
                    default=[1.5, 1.5, 3.0])
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import sys
    sys.path.insert(0, str(Path(__file__).resolve().parents[1]))
    from smb_vision_tpu.data.nifti import save_nifti

    out = Path(args.out)
    (out / "images").mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    depth = args.depth or args.size

    rows = []
    for i in range(args.num):
        vol = make_volume(rng, args.size, depth)
        aff = np.diag([*args.spacing, 1.0])
        path = out / "images" / f"case_{i:04d}.nii.gz"
        save_nifti(path, vol.astype(np.int16), aff)
        split = ("train" if i < args.num * 0.7
                 else "validation" if i < args.num * 0.85 else "test")
        os_time = float(rng.uniform(1, 60))
        rows.append({
            "uid": f"case_{i:04d}",
            "image": str(path),
            "label": int(rng.integers(0, 2)),
            "histology": int(rng.integers(0, 3)),
            "age": float(rng.uniform(30, 90)),
            "sex": int(rng.integers(0, 2)),
            "os": os_time,
            "os_event": int(rng.integers(0, 2)),
            "split": split,
        })

    splits = {s: [r for r in rows if r["split"] == s]
              for s in ("train", "validation", "test")}
    with open(out / "dataset.json", "w") as f:
        json.dump(splits, f, indent=2)
    with open(out / "dataset_flat.json", "w") as f:
        json.dump(rows, f, indent=2)
    try:
        import pandas as pd

        pd.DataFrame(rows).to_parquet(out / "dataset.parquet")
        pd.DataFrame(rows).to_csv(out / "dataset.csv", index=False)
    except ImportError:
        pass
    print(f"wrote {args.num} volumes to {out}")


if __name__ == "__main__":
    main()
