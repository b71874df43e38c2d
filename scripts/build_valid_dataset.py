"""Dataset validity sweep: load+preprocess every volume concurrently,
quarantine failures, write a validated split JSON.

Role of reference scripts/build_valid_dataset.py:55-105 (threaded 32-worker
load validation -> 90/10 split) and MIMDataset.__main__ (mim.py:302-369,
valid_files.json sweep) — with the reference's broken import/signature
fixed (SURVEY §2 known-broken item 2).

Usage:
    python scripts/build_valid_dataset.py --data_dir /data \
        --out valid_dataset.json --pipeline mim --workers 16
"""

from __future__ import annotations

import argparse
import json
import sys
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", default=None)
    ap.add_argument("--data_json", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--pipeline", default="mim")
    ap.add_argument("--val_frac", type=float, default=0.1)
    ap.add_argument("--workers", type=int, default=16)
    args = ap.parse_args()

    from smb_vision_tpu.data.dataset import CTDataset
    from smb_vision_tpu.data.load import load_data

    if args.data_json:
        items = load_data(args.data_json)
    elif args.data_dir:
        items = [{"image": str(p)}
                 for p in sorted(Path(args.data_dir).rglob("*.nii*"))]
    else:
        raise SystemExit("one of --data_dir/--data_json required")

    ds = CTDataset(items=items, pipeline=args.pipeline)

    def check(i):
        try:
            vol = ds.load_volume(dict(items[i]))
            ok = bool((vol == vol).all())  # NaN check
            return i, ok, None if ok else "contains NaN"
        except Exception as e:  # noqa: BLE001
            return i, False, str(e)

    valid, invalid = [], []
    with ThreadPoolExecutor(args.workers) as pool:
        for i, ok, err in pool.map(check, range(len(items))):
            (valid if ok else invalid).append(
                items[i] if ok else {**items[i], "error": err})

    n_val = max(int(len(valid) * args.val_frac), 1) if valid else 0
    blob = {"train": valid[n_val:], "validation": valid[:n_val]}
    with open(args.out, "w") as f:
        json.dump(blob, f, indent=2)
    if invalid:
        qpath = Path(args.out).with_suffix(".invalid.json")
        with open(qpath, "w") as f:
            json.dump(invalid, f, indent=2)
        print(f"{len(invalid)} invalid -> {qpath}")
    print(f"{len(valid)} valid -> {args.out}")


if __name__ == "__main__":
    main()
