"""Malformed-NIfTI fuzz corpus through BOTH loaders (first-party python
data/nifti.py and the C++ csrc/ctloader.cpp), asserting graceful failure
— error return / clean exception, no crash, no hang — and identical
accept/reject verdicts (round-3 VERDICT #5).

Corpus classes: truncated gzip, truncated payload, zero/negative dims,
dim[0] outside 1..7, bad datatype codes, garbage/non-finite vox_offset,
non-finite scl_slope (must be ACCEPTED — spec'd as "ignore"), plus 200
seeded random header mutations.

The same corpus can drive the ASan/UBSan build:
  python scripts/build_native.py --sanitize
  LD_PRELOAD=$(g++ -print-file-name=libasan.so) \
  ASAN_OPTIONS=detect_leaks=0 SMB_CTLOADER_LIB=libctloader_asan.so \
  python -m pytest tests/test_native_fuzz.py -q
"""

import gzip
import struct

import numpy as np
import pytest

from smb_vision_tpu.data import native
from smb_vision_tpu.data.nifti import load_nifti, save_nifti

pytestmark = pytest.mark.skipif(not native.native_available(),
                                reason="native loader not built")

TARGET = dict(target_size=(8, 8, 8), target_spacing=(2.0, 2.0, 2.0))


def _valid_bytes(tmp_path) -> bytes:
    rng = np.random.default_rng(0)
    vol = (rng.normal(size=(16, 16, 16)) * 100).astype(np.int16)
    p = tmp_path / "valid.nii"
    save_nifti(p, vol, np.diag([1.5, 1.5, 3.0, 1.0]))
    return p.read_bytes()


def _verdicts(path):
    try:
        img = load_nifti(path)
        ok_py = bool(np.asarray(img.data).size)
    except Exception:  # noqa: BLE001 — ANY clean exception = reject
        ok_py = False
    _, status = native.native_load_batch([str(path)], num_threads=1,
                                         **TARGET)
    return ok_py, status[0] == 0


def _write(tmp_path, name, payload, gz=False):
    p = tmp_path / name
    p.write_bytes(gzip.compress(payload, 1) if gz else payload)
    return p


def _mutant(base: bytes, off: int, fmt: str, value) -> bytes:
    b = bytearray(base)
    struct.pack_into("<" + fmt, b, off, value)
    return bytes(b)


CASES = [
    # (name, expected_verdict, mutator(valid_bytes) -> bytes, gz)
    ("valid", True, lambda b: b, False),
    ("valid_gz", True, lambda b: b, True),
    ("zero_dim1", False, lambda b: _mutant(b, 42, "h", 0), False),
    ("neg_dim2", False, lambda b: _mutant(b, 44, "h", -5), False),
    ("ndim_zero", False, lambda b: _mutant(b, 40, "h", 0), False),
    ("ndim_nine", False, lambda b: _mutant(b, 40, "h", 9), False),
    ("ndim_neg", False, lambda b: _mutant(b, 40, "h", -1), False),
    ("bad_dtype_3", False, lambda b: _mutant(b, 70, "h", 3), False),
    ("bad_dtype_999", False, lambda b: _mutant(b, 70, "h", 999), False),
    ("vox_offset_zero", False, lambda b: _mutant(b, 108, "f", 0.0), False),
    ("vox_offset_past_eof", False,
     lambda b: _mutant(b, 108, "f", 1e9), False),
    ("vox_offset_nan", False,
     lambda b: _mutant(b, 108, "f", float("nan")), False),
    ("vox_offset_neg", False,
     lambda b: _mutant(b, 108, "f", -4.0), False),
    # non-finite scl_slope/inter: spec + nibabel say IGNORE, not reject
    ("nan_slope", True,
     lambda b: _mutant(b, 112, "f", float("nan")), False),
    ("inf_inter", True,
     lambda b: _mutant(b, 116, "f", float("inf")), False),
    ("zero_slope", True, lambda b: _mutant(b, 112, "f", 0.0), False),
    # payload truncation: half the voxel data missing
    ("truncated_payload", False, lambda b: b[: 352 + 16 * 16 * 16], False),
    ("header_only", False, lambda b: b[:348], False),
    ("tiny_file", False, lambda b: b[:40], False),
    ("empty_file", False, lambda b: b"", False),
    ("not_nifti", False, lambda b: b"\x00" * 1024, False),
    # oversized dim -> count overflows available payload
    ("huge_dim", False, lambda b: _mutant(b, 42, "h", 30000), False),
]


@pytest.mark.parametrize("name,expect,mut,gz",
                         CASES, ids=[c[0] for c in CASES])
def test_corpus_class(tmp_path, name, expect, mut, gz):
    base = _valid_bytes(tmp_path)
    p = _write(tmp_path, f"{name}.nii" + (".gz" if gz else ""),
               mut(base), gz)
    ok_py, ok_cc = _verdicts(p)
    assert ok_py == expect, f"python verdict {ok_py} != {expect}"
    assert ok_cc == expect, f"native verdict {ok_cc} != {expect}"


def test_truncated_gzip(tmp_path):
    base = _valid_bytes(tmp_path)
    comp = gzip.compress(base, 1)
    for frac, tag in ((0.5, "half"), (0.9, "ninety"), (0.05, "head")):
        p = tmp_path / f"trunc_{tag}.nii.gz"
        p.write_bytes(comp[: int(len(comp) * frac)])
        ok_py, ok_cc = _verdicts(p)
        assert not ok_py and not ok_cc, (tag, ok_py, ok_cc)


def test_random_header_mutations_agree(tmp_path):
    """200 seeded random 1-2 byte header corruptions: neither loader may
    crash or hang, and their accept/reject verdicts must agree."""
    base = _valid_bytes(tmp_path)
    rng = np.random.default_rng(1234)
    disagreements = []
    for i in range(200):
        b = bytearray(base)
        for _ in range(int(rng.integers(1, 3))):
            off = int(rng.integers(0, 352))
            b[off] = int(rng.integers(0, 256))
        p = _write(tmp_path, f"mut_{i}.nii", bytes(b))
        ok_py, ok_cc = _verdicts(p)
        if ok_py != ok_cc:
            disagreements.append((i, ok_py, ok_cc, bytes(b[:4])))
    assert not disagreements, disagreements[:5]


def test_random_payload_mutations_accepted(tmp_path):
    """Voxel-byte corruption (valid header) must stay accepted by both
    and produce finite preprocessed output from the native path (the HU
    window clamps any garbage into range)."""
    base = _valid_bytes(tmp_path)
    rng = np.random.default_rng(99)
    for i in range(20):
        b = bytearray(base)
        for _ in range(64):
            off = int(rng.integers(352, len(base)))
            b[off] = int(rng.integers(0, 256))
        p = _write(tmp_path, f"pay_{i}.nii", bytes(b))
        ok_py, ok_cc = _verdicts(p)
        assert ok_py and ok_cc, (i, ok_py, ok_cc)
        vols, status = native.native_load_batch([str(p)], num_threads=1,
                                                **TARGET)
        assert status[0] == 0 and np.isfinite(vols).all()
