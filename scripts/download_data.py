"""Data-pull helpers: S3 and Orthanc (DICOM server) downloads.

Role of reference scripts/misc/download_from_s3.py:1-37 and
download_from_orthanc.py:1-60 (+ sync_s3.sh). Environment-gated: boto3 /
requests are optional; errors are actionable instead of import crashes.

Usage:
    python scripts/download_data.py s3 --bucket b --prefix p --out /data
    python scripts/download_data.py orthanc --url http://host:8042 \
        --out /data [--auth user:pass]
"""

from __future__ import annotations

import argparse
from pathlib import Path


def download_s3(bucket: str, prefix: str, out: str) -> None:
    try:
        import boto3
    except ImportError:
        raise SystemExit("boto3 not installed in this image; run from an "
                         "environment with AWS access")
    s3 = boto3.client("s3")
    out_dir = Path(out)
    out_dir.mkdir(parents=True, exist_ok=True)
    paginator = s3.get_paginator("list_objects_v2")
    n = 0
    for page in paginator.paginate(Bucket=bucket, Prefix=prefix):
        for obj in page.get("Contents", []):
            key = obj["Key"]
            dest = out_dir / key[len(prefix):].lstrip("/")
            dest.parent.mkdir(parents=True, exist_ok=True)
            s3.download_file(bucket, key, str(dest))
            n += 1
    print(f"downloaded {n} objects from s3://{bucket}/{prefix} -> {out}")


def download_orthanc(url: str, out: str, auth: str | None = None) -> None:
    try:
        import requests
    except ImportError:
        raise SystemExit("requests not installed in this image")
    sess = requests.Session()
    if auth:
        user, pw = auth.split(":", 1)
        sess.auth = (user, pw)
    out_dir = Path(out)
    out_dir.mkdir(parents=True, exist_ok=True)
    studies = sess.get(f"{url}/studies").json()
    for sid in studies:
        archive = sess.get(f"{url}/studies/{sid}/archive")
        (out_dir / f"{sid}.zip").write_bytes(archive.content)
    print(f"downloaded {len(studies)} studies from {url} -> {out}")


def main():
    ap = argparse.ArgumentParser()
    sub = ap.add_subparsers(dest="cmd", required=True)
    s3p = sub.add_parser("s3")
    s3p.add_argument("--bucket", required=True)
    s3p.add_argument("--prefix", default="")
    s3p.add_argument("--out", required=True)
    orp = sub.add_parser("orthanc")
    orp.add_argument("--url", required=True)
    orp.add_argument("--out", required=True)
    orp.add_argument("--auth", default=None)
    args = ap.parse_args()
    if args.cmd == "s3":
        download_s3(args.bucket, args.prefix, args.out)
    else:
        download_orthanc(args.url, args.out, args.auth)


if __name__ == "__main__":
    main()
