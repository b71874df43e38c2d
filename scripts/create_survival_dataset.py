"""Build a survival-analysis dataset (OS / OS_event / 1-year label) from a
clinical table + image directory.

Role of reference scripts/preprocess/create_mdacc_data.py:9-120 (the
MD Anderson builder), generalised: any CSV/parquet/xlsx with patient id,
survival-time and event columns, joined against NIfTI paths.

Usage:
    python scripts/create_survival_dataset.py \
        --table clinical.csv --image_dir /data/ct \
        --id_col patient_id --time_col os_months --event_col dead \
        --out survival_dataset.json --one_year_label
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--table", required=True)
    ap.add_argument("--image_dir", required=True)
    ap.add_argument("--id_col", default="patient_id")
    ap.add_argument("--time_col", default="os")
    ap.add_argument("--event_col", default="os_event")
    ap.add_argument("--out", required=True)
    ap.add_argument("--one_year_label", action="store_true",
                    help="add a binary 1-year survival label column")
    ap.add_argument("--val_frac", type=float, default=0.1)
    ap.add_argument("--test_frac", type=float, default=0.1)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import numpy as np
    import pandas as pd

    suffix = Path(args.table).suffix.lower()
    if suffix == ".csv":
        df = pd.read_csv(args.table)
    elif suffix == ".parquet":
        df = pd.read_parquet(args.table)
    elif suffix == ".xlsx":
        df = pd.read_excel(args.table)
    else:
        raise SystemExit(f"unsupported table format {suffix}")

    # index NIfTIs by stem (uid)
    by_uid = {}
    for p in Path(args.image_dir).rglob("*.nii*"):
        stem = p.name
        for suf in (".nii.gz", ".nii"):
            if stem.endswith(suf):
                stem = stem[: -len(suf)]
        by_uid[stem] = str(p)

    rows, missing = [], 0
    for _, r in df.iterrows():
        uid = str(r[args.id_col])
        if uid not in by_uid:
            missing += 1
            continue
        time = float(r[args.time_col])
        event = int(r[args.event_col])
        row = {"uid": uid, "image": by_uid[uid], "os": time,
               "os_event": event}
        if args.one_year_label:
            # 1 = died within 12 months (events only; censored <12mo are
            # indeterminate and excluded, matching the reference builder)
            if time >= 12.0:
                row["label"] = 0
            elif event:
                row["label"] = 1
            else:
                continue
        # passthrough any extra clinical covariates (age, sex, ...)
        for c in df.columns:
            if c not in (args.id_col, args.time_col, args.event_col):
                v = r[c]
                row[c] = v.item() if hasattr(v, "item") else v
        rows.append(row)

    rng = np.random.default_rng(args.seed)
    rng.shuffle(rows)
    n = len(rows)
    n_test = int(n * args.test_frac)
    n_val = int(n * args.val_frac)
    blob = {"train": rows[n_test + n_val:],
            "validation": rows[n_test:n_test + n_val],
            "test": rows[:n_test]}
    with open(args.out, "w") as f:
        json.dump(blob, f, indent=2, default=str)
    print(f"{n} matched ({missing} table rows without images) -> {args.out} "
          f"({len(blob['train'])}/{len(blob['validation'])}"
          f"/{len(blob['test'])} train/val/test)")


if __name__ == "__main__":
    main()
