"""Summarise the round-3 end-to-end MIM CLI run (VERDICT #6).

Input: /tmp/e2e_out/metrics.jsonl from a 3-epoch, 26-volume, bs1
full-res run with --logging_steps 1. Epoch 1 is cold (decode ->
native preprocess -> f16 disk cache); epochs 2-3 are cache-hit
(mmap -> bf16 cast -> relay upload -> step).

Prints per-phase wall time, vol/s, and the compute/IO split using the
synthetic-step compute time as the compute anchor.
"""
import json
import sys

N_VOLS = 26
SYNTH_STEP_MS = 268.0   # BENCHMARKS.md full-res MIM d64 bs1 synthetic

def main(path="/tmp/e2e_out/metrics.jsonl"):
    recs = [json.loads(l) for l in open(path) if l.strip()]
    recs = [r for r in recs if "step" in r]
    epochs = {}
    for r in recs:
        e = (r["step"] - 1) // N_VOLS + 1
        epochs.setdefault(e, []).append(r["step_time_ms"])
    for e, ts in sorted(epochs.items()):
        tot = sum(ts) / 1e3
        import numpy as np

        med = np.median(ts) / 1e3
        print(f"epoch {e}: {len(ts)} steps, {tot:.1f} s total, "
              f"median step {med:.2f} s, {len(ts)/tot:.3f} vol/s, "
              f"IO share of median step "
              f"{(med - SYNTH_STEP_MS/1e3)/med*100:.0f}%")
    steady = [t for e, ts in epochs.items() if e >= 2 for t in ts]
    if steady:
        import numpy as np

        tot = sum(steady) / 1e3
        print(f"steady-state (epochs>=2): {len(steady)/tot:.3f} vol/s "
              f"end-to-end; compute {SYNTH_STEP_MS/1e3:.2f} s of median "
              f"{np.median(steady)/1e3:.2f} s step")
    losses = [r["loss"] for r in recs]
    print(f"loss: {losses[0]:.4f} -> {losses[-1]:.4f} over {len(recs)} steps")


if __name__ == "__main__":
    main(*sys.argv[1:])
