"""bf16+pallas vs f32+XLA trajectory drift (round-5 VERDICT #7).

The learning-equivalence program proves trainer semantics on the
f32/XLA path; production trains bf16 with the pallas kernels. This
measures how far the PRODUCTION-precision trajectory drifts from the
proven f32 one: the same MIM model trained from the SAME f32 init on
identical batches and masks for N steps under

  A. dtype=float32, attn_impl=xla,    mlp_impl=xla      (the proven path)
  B. dtype=bfloat16, attn_impl=pallas, mlp_impl=pallas  (production fwd)
  C. dtype=bfloat16, attn_impl=pallas, mlp_impl=pallas_bwd (kernel bwd)

reporting per-step relative loss divergence. On CPU the pallas kernels
run in interpret mode (same arithmetic as Mosaic modulo compiler
scheduling); pass `tpu` to run B/C compiled on the chip.

Geometry: kernel-mappable tiny ViT (hidden 128, 256 tokens/sample,
128 visible after 0.5 masking — mappable even at the init batch of 1).
"""
import sys

sys.path.insert(0, "/root/repo")

on_tpu = len(sys.argv) > 1 and sys.argv[1] == "tpu"

import jax  # noqa: E402

if not on_tpu:
    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)
    jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402
import optax  # noqa: E402

from smb_vision_tpu.models.configs import VideoMAEConfig  # noqa: E402
from smb_vision_tpu.train.mim import make_mim_workload  # noqa: E402

STEPS = 20
B = 2
KW = dict(image_size=128, num_frames=64, patch_size=16, tubelet_size=16,
          num_channels=1, hidden_size=128, num_hidden_layers=2,
          num_attention_heads=2, intermediate_size=256,
          decoder_hidden_size=128, decoder_num_hidden_layers=1,
          decoder_num_attention_heads=2, decoder_intermediate_size=256)


def run(dtype, attn_impl, mlp_impl, px, f32_params=None):
    cfg = VideoMAEConfig(dtype=dtype, attn_impl=attn_impl,
                         mlp_impl=mlp_impl, norm_pix_loss=True, **KW)
    tx = optax.adamw(1e-3)
    _, init_fn, step_fn, _ = make_mim_workload(
        cfg, mask_patch_size=16, mask_ratio=0.5, tx=tx)
    state = init_fn(jax.random.PRNGKey(0))
    if f32_params is not None:
        state["params"] = f32_params      # identical f32 master weights
    jstep = jax.jit(step_fn, donate_argnums=(0,))
    losses = []
    for s in range(STEPS):
        state, metrics = jstep(state, {"pixel_values": px[s % 2]},
                               jax.random.PRNGKey(s))
        losses.append(float(metrics["loss"]))
    return losses, state["params"]


def main():
    rng = np.random.default_rng(0)
    px = [jnp.asarray(rng.normal(size=(B, 64, 1, 128, 128)), jnp.float32)
          for _ in range(2)]

    ref_losses, ref_params = run("float32", "xla", "xla", px)
    base = jax.tree.map(jnp.copy, ref_params) if False else None
    # same init by construction: init_fn uses PRNGKey(0) and f32 params
    variants = {
        "bf16+pallas(fwd)": ("bfloat16", "pallas", "pallas"),
        "bf16+pallas_bwd": ("bfloat16", "pallas", "pallas_bwd"),
        # int8-score attention backward at amplified lr (the workload lr
        # is already 1e-3 = 20x the reference MIM recipe): bounds the
        # gradient-quality impact of the 2x-MXU bwd (VERDICT #2)
        "bf16+i8bwd-attn": ("bfloat16", "pallas_i8bwd", "pallas_bwd"),
    }
    print(f"f32/xla losses: first {ref_losses[0]:.6f} "
          f"last {ref_losses[-1]:.6f}", flush=True)
    for name, (dt, ai, mi) in variants.items():
        losses, _ = run(dt, ai, mi, px, f32_params=base)
        rel = [abs(a - b) / max(abs(b), 1e-8)
               for a, b in zip(losses, ref_losses)]
        print(f"{name:20s} max per-step rel loss divergence over "
              f"{STEPS} steps: {max(rel):.3e}  (final losses "
              f"{losses[-1]:.6f} vs {ref_losses[-1]:.6f}; drop "
              f"{losses[0] - losses[-1]:.6f} vs "
              f"{ref_losses[0] - ref_losses[-1]:.6f})", flush=True)


if __name__ == "__main__":
    main()
