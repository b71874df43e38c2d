"""Training-step benchmarks on the v5e: full-res MIM (d64 + d128) and
V-JEPA ViT-L at the reference recipe scale. Honest protocol (distinct
inputs, scalar readback). Compare against BENCHMARKS.md round-1 numbers."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

PEAK = 197e12


def _time_steps(step, state, batches, key):
    # warmup/compile on batch 0
    state, m = step(state, batches[0], key)
    print("  compile done, loss0:", float(m["loss"]))
    times, losses = [], []
    for i, b in enumerate(batches[1:]):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = step(state, b, sub)
        loss = float(m["loss"])  # scalar readback forces completion
        times.append(time.perf_counter() - t0)
        losses.append(round(loss, 4))
    return min(times), losses


def bench_mim(heads, label, remat=True, batch=1, dec_heads=6):
    from smb_vision_tpu.models.configs import VideoMAEConfig
    from smb_vision_tpu.train.mim import make_mim_workload
    from smb_vision_tpu.utils.profiling import mim_flops_per_sample

    cfg = VideoMAEConfig(image_size=512, num_frames=320, patch_size=16,
                         tubelet_size=16, num_channels=1,
                         num_attention_heads=heads, norm_pix_loss=True,
                         decoder_num_attention_heads=dec_heads,
                         dtype="bfloat16", attn_impl="auto",
                         gradient_checkpointing=remat)
    tx = optax.adamw(1e-4)
    model, init_fn, step_fn, _ = make_mim_workload(
        cfg, mask_patch_size=32, mask_ratio=0.65, tx=tx)
    key = jax.random.PRNGKey(0)
    state = init_fn(key)
    step = jax.jit(step_fn, donate_argnums=(0,))
    batches = [{"pixel_values": jax.random.normal(
        jax.random.PRNGKey(10 + i), (batch, 320, 1, 512, 512),
        jnp.bfloat16)} for i in range(4)]
    jax.block_until_ready(batches)
    t, losses = _time_steps(step, state, batches, key)
    fl = mim_flops_per_sample(cfg, 0.65) * batch
    print(f"MIM {label} bs{batch}: {t*1e3:.0f} ms/step, "
          f"MFU {fl/t/PEAK*100:.1f}% "
          f"({fl/t/1e12:.1f} TFLOP/s) losses {losses}")


def bench_vjepa(remat=True, batch=1, teacher_impl=None, pred_heads=12,
                enc_heads=16, grad_accum=1, accum_dtype=None,
                opt="adamw"):
    from smb_vision_tpu.models.configs import VJEPA2Config
    from smb_vision_tpu.train.vjepa import make_vjepa_workload
    from smb_vision_tpu.utils.profiling import vjepa_flops_per_sample

    cfg = VJEPA2Config(crop_size=384, frames_per_clip=256, patch_size=16,
                       tubelet_size=16, in_chans=1,
                       num_attention_heads=enc_heads,
                       pred_num_attention_heads=pred_heads,
                       dtype="bfloat16", attn_impl="auto",
                       gradient_checkpointing=remat)
    if opt == "adamw8bit":
        from smb_vision_tpu.train.quantized import adamw8bit
        tx = adamw8bit(1e-4)
    else:
        tx = optax.adamw(1e-4)
    model, init_fn, step_fn, _ = make_vjepa_workload(
        cfg, tx=tx, teacher_attn_impl=teacher_impl,
        grad_accum=grad_accum, accum_dtype=accum_dtype)
    key = jax.random.PRNGKey(0)
    state = init_fn(key)
    step = jax.jit(step_fn, donate_argnums=(0,))
    gbatch = batch * grad_accum
    batches = [{"pixel_values": jax.random.normal(
        jax.random.PRNGKey(20 + i), (gbatch, 256, 1, 384, 384),
        jnp.bfloat16)} for i in range(4)]
    jax.block_until_ready(batches)
    t, losses = _time_steps(step, state, batches, key)
    fl = vjepa_flops_per_sample(cfg) * batch * grad_accum
    ti = f" teacher={teacher_impl}" if teacher_impl else ""
    if grad_accum > 1:
        ti += f" ga{grad_accum}/{accum_dtype or 'f32'}"
    if opt != "adamw":
        ti += f" {opt}"
    hd = cfg.hidden_size // enc_heads
    print(f"V-JEPA ViT-L 384^2x256 bs{batch}{ti} enc_d{hd} "
          f"pred_d{384 // pred_heads}: {t*1e3:.0f} ms/step, "
          f"MFU {fl/t/PEAK*100:.1f}% ({fl/t/1e12:.1f} TFLOP/s) "
          f"losses {losses}")


def bench_cls(batch=8, heads=12, remat=True):
    """Fine-tune step at the reference recipe geometry (224^2x160, 1,960
    tokens — run_cls.sh): VideoMAE cls head, CE loss, AdamW."""
    from smb_vision_tpu.models.configs import VideoMAEConfig
    from smb_vision_tpu.models.videomae import VideoMAEForVideoClassification
    from smb_vision_tpu.train.classification import (
        make_classification_workload,
    )
    from smb_vision_tpu.utils.profiling import encoder_flops_per_sample

    cfg = VideoMAEConfig(image_size=224, num_frames=160, patch_size=16,
                         tubelet_size=16, num_channels=1,
                         num_attention_heads=heads, num_labels=4,
                         problem_type="single_label_classification",
                         dtype="bfloat16", attn_impl="auto",
                         gradient_checkpointing=remat)
    model = VideoMAEForVideoClassification(cfg)
    tx = optax.adamw(1e-4)
    init_fn, step_fn, _ = make_classification_workload(
        model, cfg, task_type="classification", tx=tx)
    key = jax.random.PRNGKey(0)

    def mk(i):
        return {"pixel_values": jax.random.normal(
                    jax.random.PRNGKey(30 + i),
                    (batch, 160, 1, 224, 224), jnp.bfloat16),
                "labels": jnp.arange(batch, dtype=jnp.int32) % 4}

    state = init_fn(key, mk(0))
    step = jax.jit(step_fn, donate_argnums=(0,))
    batches = [mk(i) for i in range(4)]
    jax.block_until_ready(batches)
    t, losses = _time_steps(step, state, batches, key)
    fl = encoder_flops_per_sample(cfg) * 3 * batch   # fwd+bwd
    print(f"CLS 224^2x160 d{768//heads} bs{batch}: {t*1e3:.0f} ms/step, "
          f"MFU {fl/t/PEAK*100:.1f}% ({fl/t/1e12:.1f} TFLOP/s) "
          f"losses {losses}")


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "mim"):
        bench_mim(12, "d64 (reference arch)")
        bench_mim(6, "d128 (TPU config)")
    if which in ("all", "vjepa"):
        bench_vjepa()
    if which == "bs2":
        bench_vjepa(batch=2)
        bench_mim(6, "d128 (TPU config)", batch=2)
        bench_mim(12, "d64 (reference arch)", batch=2)
    if which == "teacher_i8":
        bench_vjepa(teacher_impl="pallas_int8")
        bench_vjepa(teacher_impl="pallas_int8", batch=2)
    if which == "ga":
        # the 16 GB known limit: micro-bs 1 x grad-accum 2 OOMs with the
        # f32 scan-carried accumulator; bf16 accumulation alone is still
        # 0.5 GB over — 8-bit Adam moments (-2 GB) clear it
        bench_vjepa(grad_accum=2, accum_dtype="bfloat16", opt="adamw8bit")
        bench_vjepa(grad_accum=4, accum_dtype="bfloat16", opt="adamw8bit")
    if which == "pred64":
        # predictor head_dim 32 -> 64 (same params/FLOPs, 6 heads);
        # encoder d64 -> d128 (8 heads); and the int8 teacher, composed
        bench_vjepa(pred_heads=6)
        bench_vjepa(pred_heads=6, enc_heads=8)
        bench_vjepa(pred_heads=6, enc_heads=8, teacher_impl="pallas_int8")
    if which == "tpucfg":
        # the all-d128 recommended configs (README): refresh with the
        # 2c kernels
        bench_mim(6, "d128 enc+dec (6+3 heads)", dec_heads=3)
        bench_vjepa(pred_heads=3, enc_heads=8)
    if which == "cls":
        bench_cls(batch=8)
        bench_cls(batch=8, heads=6)
    if which == "noremat":
        bench_mim(6, "d128 NO remat", remat=False)
        bench_vjepa(remat=False)
        bench_mim(12, "d64 NO remat", remat=False)
