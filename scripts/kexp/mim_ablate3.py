"""Stage-3: why does AdamW+apply add ~107 ms to the MIM step when an
isolated update probe costs ~10 ms? Variants of the full step:
  step_adamw — vag + optax.adamw update + apply   (the 282 ms baseline)
  step_sgd   — vag + plain sgd (no m/v state)
  step_raw   — vag + params := params - lr*g (no optax at all)
  opt_ext    — jitted adamw update with grads as an INPUT (donated state)
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

CFG = VideoMAEConfig(image_size=512, num_frames=320, patch_size=16,
                     tubelet_size=16, num_channels=1,
                     num_attention_heads=12, norm_pix_loss=True,
                     dtype="bfloat16", attn_impl="auto",
                     gradient_checkpointing=True)


def mk_px(seed):
    return jax.random.normal(jax.random.PRNGKey(seed),
                             (B, 320, 1, 512, 512), jnp.bfloat16)


def main():
    print("device:", jax.devices()[0].device_kind)
    key = jax.random.PRNGKey(0)
    model = VideoMAEForPreTraining(CFG)
    mask0 = mim_mask(key, B, input_size=512, depth=320, mask_patch_size=32,
                     model_patch_size=16, mask_ratio=0.65)
    params = jax.jit(model.init, static_argnums=(3,))(
        key, jnp.zeros((B, 320, 1, 512, 512), jnp.bfloat16), mask0,
        NUM_MASKED)

    def loss_fn(p, px, k):
        m = mim_mask(k, B, input_size=512, depth=320, mask_patch_size=32,
                     model_patch_size=16, mask_ratio=0.65)
        return model.apply(p, px, m, NUM_MASKED,
                           deterministic=False)["loss"]

    def run_steps(label, step, state):
        state, l = step(state, mk_px(0), jnp.int32(0))
        float(l)
        times = []
        for i in range(3):
            px = mk_px(100 + i)
            jax.block_until_ready(px)
            t0 = time.perf_counter()
            state, l = step(state, px, jnp.int32(i))
            float(l)
            times.append(time.perf_counter() - t0)
        print(f"{label:10s} {min(times)*1e3:8.1f} ms  "
              f"{[round(t*1e3) for t in times]}")

    # adamw
    tx = optax.adamw(1e-4)

    @jax.jit
    def step_adamw(state, px, seed):
        p, o = state
        l, g = jax.value_and_grad(loss_fn)(p, px, jax.random.PRNGKey(seed))
        up, o = tx.update(g, o, p)
        return (optax.apply_updates(p, up), o), l

    cp = lambda t: jax.tree_util.tree_map(jnp.copy, t)  # noqa: E731
    run_steps("step_adamw", jax.jit(step_adamw, donate_argnums=(0,)),
              (cp(params), tx.init(params)))

    # sgd
    txs = optax.sgd(1e-4)

    @jax.jit
    def step_sgd(state, px, seed):
        p, o = state
        l, g = jax.value_and_grad(loss_fn)(p, px, jax.random.PRNGKey(seed))
        up, o = txs.update(g, o, p)
        return (optax.apply_updates(p, up), o), l

    run_steps("step_sgd", jax.jit(step_sgd, donate_argnums=(0,)),
              (cp(params), txs.init(params)))

    # raw
    @jax.jit
    def step_raw(state, px, seed):
        p, _ = state
        l, g = jax.value_and_grad(loss_fn)(p, px, jax.random.PRNGKey(seed))
        newp = jax.tree_util.tree_map(lambda a, b: a - 1e-4 * b, p, g)
        return (newp, 0), l

    run_steps("step_raw", jax.jit(step_raw, donate_argnums=(0,)),
              (cp(params), 0))

    # external-grad adamw update (donated)
    opt0 = tx.init(params)
    params = cp(params)

    @jax.jit
    def opt_ext(state, g, seed):
        p, o = state
        gg = jax.tree_util.tree_map(
            lambda x: x + jnp.float32(seed) * 1e-9, g)
        up, o = tx.update(gg, o, p)
        return (optax.apply_updates(p, up), o), jnp.float32(seed)

    opt_ext = jax.jit(opt_ext, donate_argnums=(0,))
    g0 = jax.tree_util.tree_map(lambda p: jnp.ones(p.shape, jnp.float32),
                                params)
    st = (params, opt0)
    st, l = opt_ext(st, g0, jnp.int32(0))
    float(l)
    times = []
    for i in range(3):
        t0 = time.perf_counter()
        st, l = opt_ext(st, g0, jnp.int32(i + 1))
        float(l)
        times.append(time.perf_counter() - t0)
    print(f"{'opt_ext':10s} {min(times)*1e3:8.1f} ms  "
          f"{[round(t*1e3) for t in times]}")


if __name__ == "__main__":
    main()
