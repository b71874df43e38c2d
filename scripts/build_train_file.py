"""Recursive *.nii[.gz] glob -> shuffled train/val JSON.

Role of reference scripts/build_train_file.py:14-42 (which used `fire`;
plain argparse here so the dependency is explicit).

Usage:
    python scripts/build_train_file.py --data_dir /data --out train.json \
        --val_frac 0.1 --seed 0
"""

from __future__ import annotations

import argparse
import json
import random
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--val_frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    paths = sorted(str(p) for p in Path(args.data_dir).rglob("*.nii*"))
    if not paths:
        raise SystemExit(f"no NIfTI files under {args.data_dir}")
    rng = random.Random(args.seed)
    rng.shuffle(paths)
    n_val = max(int(len(paths) * args.val_frac), 1) if args.val_frac else 0
    items = [{"image": p} for p in paths]
    blob = {"train": items[n_val:], "validation": items[:n_val]}
    with open(args.out, "w") as f:
        json.dump(blob, f, indent=2)
    print(f"{len(paths)} volumes -> {args.out} "
          f"({len(blob['train'])} train / {len(blob['validation'])} val)")


if __name__ == "__main__":
    main()
