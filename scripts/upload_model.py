"""Publish a trained model directory to the HuggingFace Hub.

Role of reference scripts/upload_model.py:6-23 (HfApi.upload_folder with
safetensors/json allow-patterns). Gated: requires huggingface_hub + a token.

Usage:
    python scripts/upload_model.py --model_dir out/mim \
        --repo_id org/smb-vision-tpu-base
"""

from __future__ import annotations

import argparse


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--repo_id", required=True)
    ap.add_argument("--private", action="store_true")
    args = ap.parse_args()

    try:
        from huggingface_hub import HfApi
    except ImportError:
        raise SystemExit("huggingface_hub not installed in this image; "
                         "run from an environment with hub access")

    api = HfApi()
    api.create_repo(args.repo_id, exist_ok=True, private=args.private)
    api.upload_folder(
        folder_path=args.model_dir,
        repo_id=args.repo_id,
        allow_patterns=["*.safetensors", "*.json"],
    )
    print(f"uploaded {args.model_dir} -> {args.repo_id}")


if __name__ == "__main__":
    main()
