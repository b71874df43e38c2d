"""Task-level validation of the int8-score attention path (VERDICT #9).

The headline bench rides attn_impl="pallas_int8" (rel err ~0.5-0.9% vs the
f32 softmax at kernel level). This script measures what that error does at
the TASK level: embed real full-res volumes (512^2x320, the 6 preprocessed
CT volumes in /tmp/cache512) with the 20-step-trained ViT-Base checkpoint
(/tmp/mim512) through BOTH paths and report:

- per-volume pooled-embedding cosine (bf16-pallas vs int8-score)
- per-token cosine distribution (mean / worst token over 20480 tokens)
- retrieval-rank stability: the 6x6 pairwise cosine matrix of pooled
  embeddings under each path; exact neighbor-order agreement + max
  absolute similarity shift.

Both paths run inside ONE jit per volume (single relay dispatch, small
readback); params are jit arguments (never closure captures).
"""
import json
import sys
from pathlib import Path

sys.path.insert(0, "/root/repo")

import numpy as np

CKPT = Path("/tmp/mim512")
CACHE = Path("/tmp/cache512")


def main():
    import jax
    import jax.numpy as jnp

    from smb_vision_tpu.models.configs import VideoMAEConfig
    from smb_vision_tpu.models.convert import load_backbone_into
    from smb_vision_tpu.models.videomae import VideoMAEModel

    print("device:", jax.devices()[0].device_kind, flush=True)

    cfg = json.loads((CKPT / "config.json").read_text())
    mk_cfg = lambda impl: VideoMAEConfig.from_dict(
        {**cfg, "attn_impl": impl, "gradient_checkpointing": False})
    m_bf16 = VideoMAEModel(mk_cfg("pallas"))
    m_i8 = VideoMAEModel(mk_cfg("pallas_int8"))

    key = jax.random.PRNGKey(0)
    example = jnp.zeros((1, cfg["num_frames"], 1, cfg["image_size"],
                         cfg["image_size"]), jnp.bfloat16)
    params = jax.jit(m_bf16.init)(key, example)
    params = load_backbone_into(params, str(CKPT / "model.safetensors"))

    # Three paths in one dispatch per volume:
    #   a: bf16 flash, default blocking      (the exact-softmax reference)
    #   b: int8-score path                   (the path under test)
    #   c: bf16 flash, halved blocking — exact softmax, different
    #      accumulation order. a-vs-c is the NOISE CONTROL: any centered
    #      structure a and c disagree on is below the bf16 rounding floor
    #      of the pipeline itself, and disagreement of b at the same
    #      magnitude cannot be attributed to int8.
    from functools import partial

    import smb_vision_tpu.models.layers as layers_mod

    orig_attention = layers_mod.attention

    @jax.jit
    def all_three(params, px):
        a, _ = m_bf16.apply(params, px)   # (1, L, D)
        b, _ = m_i8.apply(params, px)
        # patch the name layers.py actually calls; trace-time only
        layers_mod.attention = partial(orig_attention,
                                       block_q=2048, block_k=1024)
        try:
            c, _ = m_bf16.apply(params, px)
        finally:
            layers_mod.attention = orig_attention
        a = a[0].astype(jnp.float32)
        b = b[0].astype(jnp.float32)
        c = c[0].astype(jnp.float32)

        def cos(x, y, axis):
            num = jnp.sum(x * y, axis=axis)
            den = (jnp.linalg.norm(x, axis=axis)
                   * jnp.linalg.norm(y, axis=axis))
            return num / jnp.maximum(den, 1e-12)

        tok_ab = cos(a, b, axis=-1)                # (L,)
        tok_ac = cos(a, c, axis=-1)
        pa, pb, pc = (jnp.mean(x, axis=0) for x in (a, b, c))
        return (pa, pb, pc,
                jnp.mean(tok_ab), jnp.min(tok_ab),
                jnp.mean(tok_ac), jnp.min(tok_ac))

    vols = sorted(CACHE.glob("*.npy"))
    print(f"{len(vols)} cached full-res volumes", flush=True)
    pooled = {"a": [], "b": [], "c": []}
    for p in vols:
        import ml_dtypes

        px = np.load(p).astype(ml_dtypes.bfloat16)[None]  # (1,D,C,H,W)
        pa, pb, pc, tab_m, tab_w, tac_m, tac_w = all_three(
            params, jnp.asarray(px))
        pooled["a"].append(np.asarray(pa))
        pooled["b"].append(np.asarray(pb))
        pooled["c"].append(np.asarray(pc))
        print(f"{p.stem[:8]}: tok cos bf16-vs-int8 {float(tab_m):.6f} "
              f"(worst {float(tab_w):.6f})  noise-ctrl bf16-vs-bf16' "
              f"{float(tac_m):.6f} (worst {float(tac_w):.6f})", flush=True)

    mats = {}
    for k, v in pooled.items():
        X = np.stack(v).astype(np.float64)
        # raw mean-pooled embeddings share a large common component
        # (cos ~1.0 between ANY two phantom volumes); the centered
        # residual is what retrieval structure lives in — report its
        # scale relative to the common mode too
        resid = X - X.mean(axis=0)
        mats[k] = (resid / np.linalg.norm(resid, axis=1, keepdims=True),
                   float(np.linalg.norm(resid, axis=1).mean()
                         / np.linalg.norm(X, axis=1).mean()))
    A, ra = mats["a"]
    B, _ = mats["b"]
    C, _ = mats["c"]
    print(f"centered-residual scale: {ra:.2e} of the pooled norm",
          flush=True)
    n = len(vols)
    off = ~np.eye(n, dtype=bool)

    def report(tag, X, Y):
        SX, SY = X @ X.T, Y @ Y.T
        order = all(
            list(np.argsort(-SX[i][off[i]]))
            == list(np.argsort(-SY[i][off[i]])) for i in range(n))
        print(f"{tag}: centered per-volume cos "
              f"{np.round(np.sum(X * Y, axis=1), 3).tolist()}  "
              f"pairwise-sim |delta| max {np.abs(SX - SY)[off].max():.2e} "
              f"mean {np.abs(SX - SY)[off].mean():.2e}  "
              f"neighbor order identical: {order}", flush=True)

    report("bf16 vs int8      ", A, B)
    report("bf16 vs bf16-ctrl ", A, C)


if __name__ == "__main__":
    main()
