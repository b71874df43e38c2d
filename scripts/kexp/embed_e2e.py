"""BASELINE-metric measurement: batch embedding end-to-end vol/s through
cli/run_inference over 26 real NIfTI volumes at 512^2x320
(decode -> native resample -> [uint8 ship] -> encode -> .npy), the
reference's production embed path (run_inspect.py:205-235).

Phases (one process so the jit cache persists across runs):
  1. warmup: --max_samples 4 (compiles the batch-4 encode) and a
     2-volume run (compiles the ragged final batch-2 shape)
  2. timed COLD run: all 26 volumes, no disk cache — the literal
     decode->resample->encode->npy metric
  3. timed WARM run: uint8 disk cache prewarmed by phase 2? (no cache in
     phase 2) -> build cache, then timed cache-hit run: upload+encode+npy

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kexp/embed_e2e.py [data_dir]
"""

import json
import shutil
import sys
import time
from pathlib import Path

DATA = sys.argv[1] if len(sys.argv) > 1 else "/tmp/bvol/images"
WORK = Path("/tmp/embed_e2e")
ATTN = "pallas_int8"

from smb_vision_tpu.cli.run_inference import main as run_inf  # noqa: E402


def run(tag, out_dir, extra, n_expect):
    argv = [
        "--data_dir", DATA, "--output_dir", str(out_dir),
        "--image_size", "512", "--depth", "320", "--patch_size", "16",
        "--batch_size", "4", "--format", "npy",
        "--dtype", "bfloat16", "--input_dtype", "uint8",
        "--attn_impl", ATTN, "--num_workers", "8",
    ] + extra
    t0 = time.perf_counter()
    run_inf(argv)
    dt = time.perf_counter() - t0
    n_npy = len(list(Path(out_dir).glob("*.npy")))
    rec = {"tag": tag, "wall_s": round(dt, 2), "volumes": n_npy,
           "vol_per_s": round(n_npy / dt, 4), "attn": ATTN}
    print("RESULT", json.dumps(rec))
    assert n_npy == n_expect, (tag, n_npy, n_expect)
    return rec


if WORK.exists():
    shutil.rmtree(WORK)
WORK.mkdir(parents=True)

recs = []
# 1. compile warmups (timings not used)
run("warmup_b4", WORK / "w4", ["--max_samples", "4"], 4)
run("warmup_b2", WORK / "w2", ["--max_samples", "2"], 2)

# 2. cold: decode+resample fresh per volume (no cache), all 26
recs.append(run("cold_26", WORK / "cold", [], 26))

# 3a. build the uint8 disk cache (also an embed run; timed for the
#     cache-build regime), then 3b. cache-hit run
cache = WORK / "cache"
recs.append(run("cache_build_26", WORK / "cb",
                ["--cache_data_dir", str(cache),
                 "--cache_dtype", "uint8"], 26))
recs.append(run("cache_hit_26", WORK / "ch",
                ["--cache_data_dir", str(cache),
                 "--cache_dtype", "uint8"], 26))

out = Path("scripts/kexp/results/embed_e2e.jsonl")
out.parent.mkdir(parents=True, exist_ok=True)
with out.open("a") as f:
    for r in recs:
        f.write(json.dumps(r) + "\n")
print("wrote", out)
