"""Transform-verification filter: validate every manifest item end-to-end
through the preprocessing chain and write a filtered dataset JSON.

Role of reference scripts/misc/run_data_filtering.py:23-52,126-185 (the
S3-side variant; here the storage side is pluggable — local paths by
default, any fsspec-style loader via --prefix strip/replace).

Usage:
    python scripts/run_data_filtering.py --data_json raw.json \
        --out filtered.json --pipeline vjepa --workers 16
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
    ap.add_argument("--data_json", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--pipeline", default="vjepa")
    ap.add_argument("--workers", type=int, default=16)
    ap.add_argument("--min_nonzero_frac", type=float, default=0.0,
                    help="reject volumes with fewer in-window voxels")
    args = ap.parse_args()

    import numpy as np

    from smb_vision_tpu.data.dataset import CTDataset
    from smb_vision_tpu.data.load import load_data

    blob = load_data(args.data_json)
    # load_data on a dict-of-splits without `split` yields a list of split
    # lists (reference load.py:46 semantics) — flatten to items
    items = []
    for entry in blob:
        items.extend(entry if isinstance(entry, list) else [entry])
    ds = CTDataset(items=items, pipeline=args.pipeline)

    def check(i):
        try:
            vol = ds.load_volume(dict(items[i]))
            if not np.isfinite(vol).all():
                return i, "non-finite values"
            if args.min_nonzero_frac and \
                    (vol > 0).mean() < args.min_nonzero_frac:
                return i, "below min_nonzero_frac"
            return i, None
        except Exception as e:  # noqa: BLE001
            return i, str(e)

    kept, rejected = [], []
    with ThreadPoolExecutor(args.workers) as pool:
        for i, err in pool.map(check, range(len(items))):
            if err is None:
                kept.append(items[i])
            else:
                rejected.append({**items[i], "error": err})

    with open(args.out, "w") as f:
        json.dump(kept, f, indent=2)
    if rejected:
        with open(Path(args.out).with_suffix(".rejected.json"), "w") as f:
            json.dump(rejected, f, indent=2)
    print(f"kept {len(kept)}/{len(items)} -> {args.out}")


if __name__ == "__main__":
    main()
