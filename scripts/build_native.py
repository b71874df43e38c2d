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


def build(verbose: bool = True, sanitize: bool = False) -> Path:
    OUT_DIR.mkdir(parents=True, exist_ok=True)
    # NOTE: no -ffast-math — linking it into a shared library installs
    # crtfastmath's FTZ/DAZ mode process-wide, silently changing the host
    # Python's float behaviour.
    out = OUT_DIR / ("libctloader_asan.so" if sanitize else OUT.name)
    cmd = [
        "g++", "-O3", "-std=c++17", "-shared", "-fPIC", "-pthread",
        "-funroll-loops",
    ]
    if sanitize:
        # ASan/UBSan build for the fuzz corpus (tests/test_native_fuzz.py
        # --sanitize run). Loading it via ctypes needs
        # LD_PRELOAD=$(g++ -print-file-name=libasan.so) and
        # ASAN_OPTIONS=detect_leaks=0 on the python process.
        cmd += ["-g", "-fsanitize=address,undefined",
                "-fno-sanitize-recover=all"]
    cmd += [str(SRC), "-lz", "-o", str(out)]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build(sanitize="--sanitize" in sys.argv)
    print(f"built {path}")
    sys.exit(0)
