"""Second-stage MIM step ablation: where do ~150 ms hide between the
component sum and the full step? Times (single calls, ~25 ms relay floor
each, 3 repeats, min):
  fwd        — loss forward only
  vag        — value_and_grad (remat on)
  vag_nr     — value_and_grad (remat off)
  step       — full step (vag + AdamW + apply), remat on
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import optax

from smb_vision_tpu.models.configs import VideoMAEConfig
from smb_vision_tpu.ops.masking import mim_mask, num_masked_tokens
from smb_vision_tpu.models.videomae import VideoMAEForPreTraining

B = 1
NUM_MASKED = num_masked_tokens(512, 320, 32, 16, 0.65)


def cfg_of(remat):
    return VideoMAEConfig(image_size=512, num_frames=320, patch_size=16,
                          tubelet_size=16, num_channels=1,
                          num_attention_heads=12, norm_pix_loss=True,
                          dtype="bfloat16", attn_impl="auto",
                          gradient_checkpointing=remat)


def timeit(label, fn, mk_args, n=3):
    fn(*mk_args(0))
    times = []
    for i in range(n):
        args = mk_args(100 + i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{label:8s} {min(times)*1e3:8.1f} ms  "
          f"{[round(t*1e3) for t in times]}")


def main():
    print("device:", jax.devices()[0].device_kind)
    key = jax.random.PRNGKey(0)

    def mk_px(seed):
        return jax.random.normal(jax.random.PRNGKey(seed),
                                 (B, 320, 1, 512, 512), jnp.bfloat16)

    for remat in (True, False):
        cfg = cfg_of(remat)
        model = VideoMAEForPreTraining(cfg)
        mask0 = mim_mask(key, B, input_size=512, depth=320,
                         mask_patch_size=32, model_patch_size=16,
                         mask_ratio=0.65)
        params = jax.jit(model.init, static_argnums=(3,))(
            key, jnp.zeros((B, 320, 1, 512, 512), jnp.bfloat16), mask0,
            NUM_MASKED)

        def loss_fn(p, px, k):
            m = mim_mask(k, B, input_size=512, depth=320, mask_patch_size=32,
                         model_patch_size=16, mask_ratio=0.65)
            return model.apply(p, px, m, NUM_MASKED,
                               deterministic=False)["loss"]

        @jax.jit
        def fwd(p, px, seed):
            return loss_fn(p, px, jax.random.PRNGKey(seed))

        @jax.jit
        def vag(p, px, seed):
            l, g = jax.value_and_grad(loss_fn)(p, px, jax.random.PRNGKey(seed))
            return l + jnp.sum(jax.tree_util.tree_leaves(g)[0])

        tag = "r" if remat else "nr"
        if remat:
            timeit(f"fwd_{tag}", fwd,
                   lambda i: (params, mk_px(i), jnp.int32(i)))
        timeit(f"vag_{tag}", vag,
               lambda i: (params, mk_px(i), jnp.int32(i)))

    # full step (remat on) with the current model code
    cfg = cfg_of(True)
    from smb_vision_tpu.train.mim import make_mim_workload
    tx = optax.adamw(1e-4)
    model, init_fn, step_fn, _ = make_mim_workload(
        cfg, mask_patch_size=32, mask_ratio=0.65, tx=tx)
    state = init_fn(key)
    step = jax.jit(step_fn, donate_argnums=(0,))
    batches = [{"pixel_values": mk_px(10 + i)} for i in range(4)]
    state, m = step(state, batches[0], key)
    float(m["loss"])
    times = []
    for i, b in enumerate(batches[1:]):
        key, sub = jax.random.split(key)
        t0 = time.perf_counter()
        state, m = step(state, b, sub)
        float(m["loss"])
        times.append(time.perf_counter() - t0)
    print(f"{'step':8s} {min(times)*1e3:8.1f} ms  "
          f"{[round(t*1e3) for t in times]}")


if __name__ == "__main__":
    main()
