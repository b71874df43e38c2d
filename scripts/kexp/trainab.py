"""In-model training-step A/B for the round-5 backward kernels.

Runs the FULL MIM d64 (reference arch, 512^2x320, remat) and V-JEPA
ViT-L train steps with the backward-path knobs toggled, interleaved in
one process so relay phase drift cannot fake a win:

  mlp:  "pallas" (status quo: kernel fwd, XLA-recompute VJP)
        vs "pallas_bwd" (kernel fwd with h spill + kernel backward)
  attn: "pallas" vs "pallas_i8bwd" (int8-score s/dp in the bwd kernels)

Usage: trainab.py [mim|vjepa] [configs...] where configs are comma pairs
like pallas,pallas  pallas_bwd,pallas  pallas_bwd,pallas_i8bwd
(mlp_impl,attn_impl). Default: the three-step ladder.
Protocol per BENCHMARKS.md: distinct random batches, scalar readback,
min over timed steps.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

PEAK = 197e12


def _time_steps(step, state, batches, key, n=3):
    state, m = step(state, batches[0], key)
    print("    compile done, loss0:", float(m["loss"]), flush=True)
    times, losses = [], []
    for b in batches[1:]:
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = step(state, b, sub)
        losses.append(round(float(m["loss"]), 4))
        times.append(time.perf_counter() - t0)
    return min(times), losses


BATCH = 1       # override with env TRAINAB_BS
ACCUM = 1       # override with env TRAINAB_ACCUM (V-JEPA: micro-bs BATCH
                # x ACCUM accumulation, the one-chip multi-sample recipe)


def bench_mim(mlp_impl, attn_impl, d128=False):
    from smb_vision_tpu.models.configs import VideoMAEConfig
    from smb_vision_tpu.train.mim import make_mim_workload
    from smb_vision_tpu.utils.profiling import mim_flops_per_sample

    heads, dec_heads = (6, 3) if d128 else (12, 6)
    cfg = VideoMAEConfig(image_size=512, num_frames=320, patch_size=16,
                         tubelet_size=16, num_channels=1,
                         num_attention_heads=heads, norm_pix_loss=True,
                         decoder_num_attention_heads=dec_heads,
                         dtype="bfloat16", attn_impl=attn_impl,
                         mlp_impl=mlp_impl, gradient_checkpointing=True)
    if ACCUM > 1:
        from smb_vision_tpu.train.quantized import adamw8bit
        tx = adamw8bit(1e-4)
    else:
        tx = optax.adamw(1e-4)
    _, init_fn, step_fn, _ = make_mim_workload(
        cfg, mask_patch_size=32, mask_ratio=0.65, tx=tx,
        grad_accum=ACCUM,
        accum_dtype=jnp.bfloat16 if ACCUM > 1 else None)
    key = jax.random.PRNGKey(0)
    state = init_fn(key)
    step = jax.jit(step_fn, donate_argnums=(0,))
    batches = [{"pixel_values": jax.random.normal(
        jax.random.PRNGKey(10 + i), (BATCH * ACCUM, 320, 1, 512, 512),
        jnp.bfloat16)} for i in range(4)]
    jax.block_until_ready(batches)
    t, losses = _time_steps(step, state, batches, key)
    fl = mim_flops_per_sample(cfg, 0.65) * BATCH * ACCUM
    print(f"MIM {'d128' if d128 else 'd64'} "
          f"mlp={mlp_impl} attn={attn_impl}: "
          f"{t*1e3:.0f} ms/step (bs{BATCH}x{ACCUM})"
          f"  MFU {fl/t/PEAK*100:.1f}% ({fl/t/1e12:.1f} TFLOP/s) "
          f"losses {losses}", flush=True)


def bench_vjepa(mlp_impl, attn_impl, d128=False, teacher=None):
    from smb_vision_tpu.models.configs import VJEPA2Config
    from smb_vision_tpu.train.vjepa import make_vjepa_workload
    from smb_vision_tpu.utils.profiling import vjepa_flops_per_sample

    kw = dict(num_attention_heads=8, pred_num_attention_heads=3) \
        if d128 else {}
    cfg = VJEPA2Config(crop_size=384, frames_per_clip=256, patch_size=16,
                       tubelet_size=16, in_chans=1,
                       dtype="bfloat16", attn_impl=attn_impl,
                       mlp_impl=mlp_impl, gradient_checkpointing=True,
                       **kw)
    if ACCUM > 1:
        # the measured one-chip accumulation recipe pairs bf16 grad
        # accumulation with int8 Adam moments (BENCHMARKS.md)
        from smb_vision_tpu.train.quantized import adamw8bit
        tx = adamw8bit(1e-4)
    else:
        tx = optax.adamw(1e-4)
    _, init_fn, step_fn, _ = make_vjepa_workload(
        cfg, tx=tx, teacher_attn_impl=teacher, grad_accum=ACCUM,
        accum_dtype=jnp.bfloat16 if ACCUM > 1 else None)
    key = jax.random.PRNGKey(0)
    state = init_fn(key)
    step = jax.jit(step_fn, donate_argnums=(0,))
    batches = [{"pixel_values": jax.random.normal(
        jax.random.PRNGKey(20 + i), (BATCH * ACCUM, 256, 1, 384, 384),
        jnp.bfloat16)} for i in range(4)]
    jax.block_until_ready(batches)
    t, losses = _time_steps(step, state, batches, key)
    fl = vjepa_flops_per_sample(cfg) * BATCH * ACCUM
    print(f"VJEPA-L{' d128' if d128 else ''} "
          f"mlp={mlp_impl} attn={attn_impl}"
          f"{' teacher=' + teacher if teacher else ''}: "
          f"{t*1e3:.0f} ms/step (bs{BATCH}x{ACCUM})"
          f"  MFU {fl/t/PEAK*100:.1f}% ({fl/t/1e12:.1f} TFLOP/s) "
          f"losses {losses}", flush=True)


def bench_cls(mlp_impl, attn_impl, d128=False):
    """Fine-tune step at the run_cls.sh geometry (224^2x160, CE).
    Batch is FIXED at 8 (the recipe's); TRAINAB_BS does not apply."""
    from smb_vision_tpu.models.configs import VideoMAEConfig
    from smb_vision_tpu.models.videomae import (
        VideoMAEForVideoClassification)
    from smb_vision_tpu.train.classification import (
        make_classification_workload)
    from smb_vision_tpu.utils.profiling import encoder_flops_per_sample

    cfg = VideoMAEConfig(image_size=224, num_frames=160, patch_size=16,
                         tubelet_size=16, num_channels=1,
                         num_attention_heads=6 if d128 else 12,
                         num_labels=2, dtype="bfloat16",
                         attn_impl=attn_impl, mlp_impl=mlp_impl,
                         gradient_checkpointing=True)
    model = VideoMAEForVideoClassification(cfg)
    tx = optax.adamw(1e-4)
    init_fn, step_fn, _ = make_classification_workload(
        model, cfg, task_type="single_label_classification", tx=tx)
    key = jax.random.PRNGKey(0)
    batches = [{"pixel_values": jax.random.normal(
        jax.random.PRNGKey(30 + i), (8, 160, 1, 224, 224), jnp.bfloat16),
        "labels": jnp.arange(8) % 2} for i in range(4)]
    jax.block_until_ready(batches)
    state = jax.jit(init_fn)(key, batches[0])
    step = jax.jit(step_fn, donate_argnums=(0,))
    t, losses = _time_steps(step, state, batches, key)
    fl = 3 * encoder_flops_per_sample(cfg) * 8   # fwd+bwd, bs 8
    print(f"CLS {'d128' if d128 else 'd64'} "
          f"mlp={mlp_impl} attn={attn_impl}: {t*1e3:.0f} ms/step (bs8)"
          f"  MFU {fl/t/PEAK*100:.1f}% ({fl/t/1e12:.1f} TFLOP/s) "
          f"losses {losses}", flush=True)


if __name__ == "__main__":
    import os
    BATCH = int(os.environ.get("TRAINAB_BS", "1"))
    ACCUM = int(os.environ.get("TRAINAB_ACCUM", "1"))
    which = sys.argv[1] if len(sys.argv) > 1 else "mim"
    ladder = [tuple(c.split(",")) for c in sys.argv[2:]] or [
        ("pallas", "pallas"),
        ("pallas_bwd", "pallas"),
        ("pallas_bwd", "pallas_i8bwd"),
    ]
    # configs are mlp,attn[,teacher_attn] — the optional third field is
    # the V-JEPA EMA-teacher override (fwd-only, so int8-score is the
    # inference-grade path there)
    if which.startswith("mim"):
        for c in ladder:
            bench_mim(*c[:2], d128=which.endswith("d128"))
    elif which.startswith("cls"):
        for c in ladder:
            bench_cls(*c[:2], d128=which.endswith("d128"))
    else:
        for c in ladder:
            bench_vjepa(*c[:2], d128=which.endswith("d128"),
                        teacher=c[2] if len(c) > 2 else None)
