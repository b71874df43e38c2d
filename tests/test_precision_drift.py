"""Production-precision trajectory drift (round-5 VERDICT #7).

Learning equivalence vs torch is proven on the f32/XLA path; production
trains bf16 through the pallas kernels. This hermetic check trains the
same MIM model from the same init on identical batches under both
configurations and bounds the per-step loss divergence — the tolerance a
user porting a reference recipe to the production path can quote. The
measured number on the 20-step kexp run is 1.7e-5
(scripts/kexp/precision_drift.py, BENCHMARKS.md "bf16+pallas drift");
the CI bound leaves ~30x slack for platform variation."""

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smb_vision_tpu.models.configs import VideoMAEConfig
from smb_vision_tpu.train.mim import make_mim_workload

STEPS = 8
KW = dict(image_size=128, num_frames=64, patch_size=16, tubelet_size=16,
          num_channels=1, hidden_size=128, num_hidden_layers=1,
          num_attention_heads=2, intermediate_size=256,
          decoder_hidden_size=128, decoder_num_hidden_layers=1,
          decoder_num_attention_heads=2, decoder_intermediate_size=256)


def _run(dtype, attn_impl, mlp_impl, px):
    cfg = VideoMAEConfig(dtype=dtype, attn_impl=attn_impl,
                         mlp_impl=mlp_impl, norm_pix_loss=True, **KW)
    _, init_fn, step_fn, _ = make_mim_workload(
        cfg, mask_patch_size=16, mask_ratio=0.5, tx=optax.adamw(1e-3))
    state = init_fn(jax.random.PRNGKey(0))
    jstep = jax.jit(step_fn, donate_argnums=(0,))
    losses = []
    for s in range(STEPS):
        state, metrics = jstep(state, {"pixel_values": px[s % 2]},
                               jax.random.PRNGKey(s))
        losses.append(float(metrics["loss"]))
    return losses


def test_vjepa_preset_kernels_trajectory(rng):
    """The V-JEPA TPU preset stacks three precision knobs: the pallas
    MLP backward, the int8-score attention backward, and the EMA
    teacher on the int8-score FORWARD (teacher targets shift). Train
    the tiny V-JEPA from one init under the preset stack and under
    f32/XLA; the loss trajectories must track. The bound is loose
    (2e-2): a 2-head random-init teacher amplifies the int8 target
    shift relative to a real model (measured here: 5e-4 to 8e-3
    depending on seed; the REAL-scale evidence is the in-model A/B in
    BENCHMARKS.md, where 3-step losses match to ~1e-4). This test
    exists to catch structural breakage (wrong targets, sign errors),
    not to certify the noise floor."""
    import optax

    from smb_vision_tpu.models.configs import VJEPA2Config
    from smb_vision_tpu.train.vjepa import make_vjepa_workload

    def run(teacher, attn, mlp, dtype):
        cfg = VJEPA2Config(
            crop_size=64, frames_per_clip=128, patch_size=16,
            tubelet_size=16, in_chans=1, hidden_size=128,
            num_hidden_layers=2, num_attention_heads=2, mlp_ratio=2.0,
            pred_hidden_size=128, pred_num_hidden_layers=1,
            pred_num_attention_heads=2, pred_num_mask_tokens=16,
            dtype=dtype, attn_impl=attn, mlp_impl=mlp)
        _, init_fn, step_fn, _ = make_vjepa_workload(
            cfg, tx=optax.adamw(1e-3), teacher_attn_impl=teacher)
        state = init_fn(jax.random.PRNGKey(0))
        js = jax.jit(step_fn, donate_argnums=(0,))
        px = [jnp.asarray(rng.normal(size=(2, 128, 1, 64, 64)),
                          jnp.float32) for _ in range(2)]
        losses = []
        for s in range(STEPS):
            state, m = js(state, {"pixel_values": px[s % 2]},
                          jax.random.PRNGKey(s))
            losses.append(float(m["loss"]))
        return losses

    ref = run(None, "xla", "xla", "float32")
    preset = run("pallas_int8", "pallas_i8bwd", "pallas_bwd", "bfloat16")
    rel = max(abs(a - b) / max(abs(b), 1e-8)
              for a, b in zip(preset, ref))
    assert rel < 2e-2, (rel, ref, preset)
    assert ref[-1] < ref[1] and preset[-1] < preset[1], (ref, preset)


def test_bf16_pallas_trajectory_matches_f32_xla(rng):
    px = [jnp.asarray(rng.normal(size=(2, 64, 1, 128, 128)), jnp.float32)
          for _ in range(2)]
    ref = _run("float32", "xla", "xla", px)
    prod = _run("bfloat16", "pallas", "pallas_bwd", px)
    rel = max(abs(a - b) / max(abs(b), 1e-8) for a, b in zip(prod, ref))
    assert rel < 5e-4, (rel, ref, prod)
    # and the run actually optimizes on both paths
    assert ref[-1] < ref[0] and prod[-1] < prod[0], (ref, prod)
    # the V-JEPA TPU preset ships the int8-score attention backward:
    # its trajectory must hold the same bound (kexp 20-step run: within
    # 1.8e-6 absolute of the bf16 backward, BENCHMARKS.md)
    prod_i8 = _run("bfloat16", "pallas_i8bwd", "pallas_bwd", px)
    rel_i8 = max(abs(a - b) / max(abs(b), 1e-8)
                 for a, b in zip(prod_i8, ref))
    assert rel_i8 < 5e-4, (rel_i8, ref, prod_i8)
    assert prod_i8[-1] < prod_i8[0], prod_i8
