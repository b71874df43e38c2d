"""Workload-level pipeline memory probe (CPU mesh, XLA memory_analysis).

Extends pipe_mem_probe.py from a bare encoder grad to the FULL pipelined
MIM train step (make_pipelined_mim_workload: stacked pipe-sharded
encoder+decoder params, AdamW update, on-device mask gen) at a ViT-L-deep
geometry, vs the dense make_mim_workload step on one device — the number
that decides whether a model too deep for one chip's HBM trains.

Config: 12-layer/512-wide encoder + 4-layer/256-wide decoder, 1024
tokens, batch 4; 4 stages x 2 microbatches. (A 24L/1024 config exceeds
this host's XLA-CPU compile budget; the scaling argument is unchanged.)
Reports per-device temp + argument bytes of the compiled step.
"""
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

import jax.numpy as jnp  # noqa: E402
import optax  # noqa: E402

from smb_vision_tpu.models.configs import VideoMAEConfig  # noqa: E402
from smb_vision_tpu.parallel.mesh import create_mesh  # noqa: E402
from smb_vision_tpu.parallel.sharding import (  # noqa: E402
    opt_state_shardings,
    param_shardings,
    shard_params,
)
from smb_vision_tpu.train.mim import (  # noqa: E402
    make_mim_workload,
    make_pipelined_mim_workload,
)

CFG = dict(image_size=128, num_frames=32, patch_size=8, tubelet_size=8,
           num_channels=1, hidden_size=512, num_hidden_layers=12,
           num_attention_heads=8, intermediate_size=2048,
           decoder_hidden_size=256, decoder_num_hidden_layers=4,
           decoder_num_attention_heads=4, decoder_intermediate_size=1024,
           dtype="float32", attn_impl="xla")
BATCH = 4


def report(name, fn, *args):
    m = jax.jit(fn, donate_argnums=(0,)).lower(*args).compile() \
        .memory_analysis()
    print(f"{name}: temp {m.temp_size_in_bytes / 2**20:.0f} MiB, "
          f"args {m.argument_size_in_bytes / 2**20:.0f} MiB")


def main():
    key = jax.random.PRNGKey(0)
    cfg = VideoMAEConfig(**CFG)
    batch = {"pixel_values": jnp.zeros(
        (BATCH, cfg.num_frames, 1, cfg.image_size, cfg.image_size),
        jnp.float32)}
    tx = optax.adamw(1e-3)

    # dense: everything on one device
    dmesh = create_mesh(model=1, devices=jax.devices()[:1])
    _, dinit, dstep, _ = make_mim_workload(
        cfg, mask_patch_size=8, mask_ratio=0.5, tx=tx)
    with jax.set_mesh(dmesh):
        dstate = dinit(key)
        report("dense MIM step (1 device)", dstep, dstate, batch, key)

    # pipelined: 4 stages x data 2
    pmesh = create_mesh(model=4, devices=jax.devices())
    _, pinit, pstep, _ = make_pipelined_mim_workload(
        cfg, mask_patch_size=8, mask_ratio=0.5, tx=tx, mesh=pmesh,
        num_microbatches=2)
    with jax.set_mesh(pmesh):
        pstate = pinit(key)
        p_sh = param_shardings(pstate["params"], pmesh, policy="pipeline")
        pstate["params"] = shard_params(pstate["params"], p_sh)
        pstate["opt_state"] = jax.device_put(
            pstate["opt_state"],
            opt_state_shardings(pstate["opt_state"], p_sh, pmesh,
                                params=pstate["params"]))
        report("pipelined MIM step (4 stages, per-device share)",
               pstep, pstate, batch, key)


if __name__ == "__main__":
    main()
