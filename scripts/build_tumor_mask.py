"""Tumor / peritumoral patch-mask extraction from a binary segmentation.

Role of reference scripts/misc/build_tumor_mask.py:5-51: given a tumor
segmentation volume, produce (a) the tumor patch mask on the model's patch
grid and (b) a peritumoral ring via binary dilation, for masked-region
analysis of embeddings.

Usage:
    python scripts/build_tumor_mask.py --seg seg.nii.gz --out masks.npz \
        --patch_size 16 --dilate 2
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def patchify_mask(mask: np.ndarray, patch: int) -> np.ndarray:
    """Binary voxel mask -> per-patch bool (any tumor voxel in patch)."""
    h, w, d = mask.shape
    hp, wp, dp = h // patch, w // patch, d // patch
    m = mask[: hp * patch, : wp * patch, : dp * patch]
    m = m.reshape(hp, patch, wp, patch, dp, patch)
    return m.any(axis=(1, 3, 5))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seg", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--patch_size", type=int, default=16)
    ap.add_argument("--dilate", type=int, default=2,
                    help="dilation iterations for the peritumoral ring")
    args = ap.parse_args()

    from scipy.ndimage import binary_dilation

    from smb_vision_tpu.data.nifti import load_nifti

    img = load_nifti(args.seg)
    seg = np.asarray(img.data > 0)
    tumor_patches = patchify_mask(seg, args.patch_size)
    dilated = binary_dilation(seg, iterations=args.dilate * args.patch_size)
    peri = patchify_mask(dilated, args.patch_size) & ~tumor_patches
    np.savez(args.out, tumor=tumor_patches, peritumoral=peri)
    print(f"tumor patches: {int(tumor_patches.sum())}, "
          f"peritumoral: {int(peri.sum())} -> {args.out}")


if __name__ == "__main__":
    main()
