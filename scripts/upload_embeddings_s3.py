"""Append embedding parquet outputs to an S3 dataset.

Role of reference scripts/inference/upload2s3.py:7-35 (awswrangler
parquet -> S3 append). Dependency-gated on boto3; uploads the
model_id=<id>/ partition layout produced by EmbeddingWriter.

Usage:
    python scripts/upload_embeddings_s3.py --local out/embeddings \
        --bucket my-bucket --prefix embeddings/
"""

from __future__ import annotations

import argparse
from pathlib import Path


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--local", required=True)
    ap.add_argument("--bucket", required=True)
    ap.add_argument("--prefix", default="")
    args = ap.parse_args()

    try:
        import boto3
    except ImportError:
        raise SystemExit("boto3 not installed in this image; run from an "
                         "environment with AWS access")
    s3 = boto3.client("s3")
    root = Path(args.local)
    n = 0
    for p in root.rglob("*.parquet"):
        key = (args.prefix.rstrip("/") + "/"
               + str(p.relative_to(root))).lstrip("/")
        s3.upload_file(str(p), args.bucket, key)
        n += 1
    print(f"uploaded {n} parquet files -> s3://{args.bucket}/{args.prefix}")


if __name__ == "__main__":
    main()
