"""Build the native C++ CT loader (csrc/ctloader.cpp) into
smb_vision_tpu/data/_native/libctloader.so.

Usage: python scripts/build_native.py
"""

from __future__ import annotations

import subprocess
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parents[1]
SRC = ROOT / "csrc" / "ctloader.cpp"
OUT_DIR = ROOT / "smb_vision_tpu" / "data" / "_native"
OUT = OUT_DIR / "libctloader.so"


def build(verbose: bool = True) -> Path:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    # NOTE: no -ffast-math — linking it into a shared library installs
    # crtfastmath's FTZ/DAZ mode process-wide, silently changing the host
    # Python's float behaviour.
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-funroll-loops",
        str(SRC), "-lz", "-o", str(OUT),
    ]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.exit(0)
