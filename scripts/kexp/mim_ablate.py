"""Component ablation of the full-res MIM train step (512^2x320, d64).

BENCHMARKS round 2: the full step measures 279 ms while the analytic
component times sum to much less — this script times each piece as its own
jit (distinct inputs, scalar readback) to locate the gap:
  enc     — encoder stack fwd+bwd at the 7168 visible tokens
  dec     — decoder stack fwd+bwd at the full 20480 tokens
  glue    — mask gen + argsort + extract_patches x2 + gathers + norm + MSE
  embed   — patch-embed + encoder_to_decoder + head matmuls fwd+bwd
  opt     — AdamW update on a param-sized pytree
  step    — the real make_mim_workload step (reference number)
Each timed call chains NOTHING (one step is ~100ms >> 25ms relay floor).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
import optax

from smb_vision_tpu.models.configs import VideoMAEConfig
from smb_vision_tpu.models.layers import Encoder
from smb_vision_tpu.ops.patches import extract_patches, normalize_pixel_targets
from smb_vision_tpu.ops.masking import mim_mask, num_masked_tokens

CFG = VideoMAEConfig(image_size=512, num_frames=320, patch_size=16,
                     tubelet_size=16, num_channels=1,
                     num_attention_heads=12, norm_pix_loss=True,
                     dtype="bfloat16", attn_impl="auto",
                     gradient_checkpointing=True)
N = CFG.seq_len                    # 20480
NUM_MASKED = num_masked_tokens(512, 320, 32, 16, 0.65)
NVIS = N - NUM_MASKED
B = 1


def timeit(label, fn, inputs):
    fn(*inputs[0])  # compile
    times = []
    for args in inputs[1:]:
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    print(f"{label:8s} {min(times)*1e3:8.1f} ms  {[round(t*1e3) for t in times]}")
    return min(times)


def mk_inputs(shape, n=3, dtype=jnp.bfloat16):
    return [(jax.random.normal(jax.random.PRNGKey(50 + i), shape, dtype),)
            for i in range(n + 1)]


def stack(num_layers, hidden, heads, inter, remat, name):
    return Encoder(num_layers=num_layers, hidden_size=hidden,
                   num_heads=heads, intermediate_size=inter,
                   act="gelu", bias_mode="qv", layer_norm_eps=1e-12,
                   dtype=jnp.bfloat16, attn_impl="auto", remat=remat,
                   initializer_range=0.02, name=name)


def main():
    print("device:", jax.devices()[0].device_kind,
          f"N={N} NVIS={NVIS} NUM_MASKED={NUM_MASKED}")
    key = jax.random.PRNGKey(0)

    # --- encoder stack fwd+bwd at visible tokens
    enc = stack(12, 768, 12, 3072, True, "enc")
    x0 = jnp.zeros((B, NVIS, 768), jnp.bfloat16)
    pe = jax.jit(enc.init)(key, x0)

    @jax.jit
    def enc_fb(pe, x):
        def loss(p):
            return jnp.sum(enc.apply(p, x).astype(jnp.float32) ** 2)
        return jax.value_and_grad(loss)(pe)[0]

    timeit("enc", enc_fb, [(pe,) + t for t in mk_inputs((B, NVIS, 768))])

    # --- decoder stack fwd+bwd at full sequence
    dec = stack(4, 384, 6, 1536, True, "dec")
    x0 = jnp.zeros((B, N, 384), jnp.bfloat16)
    pd = jax.jit(dec.init)(key, x0)

    @jax.jit
    def dec_fb(pd, x):
        def loss(p):
            return jnp.sum(dec.apply(p, x).astype(jnp.float32) ** 2)
        return jax.value_and_grad(loss)(pd)[0]

    timeit("dec", dec_fb, [(pd,) + t for t in mk_inputs((B, N, 384))])

    # --- glue: mask gen, argsort, patch extraction, gathers, labels, MSE
    @jax.jit
    def glue(px, logits):
        mask = mim_mask(jax.random.PRNGKey(1), B, input_size=512, depth=320,
                        mask_patch_size=32, model_patch_size=16,
                        mask_ratio=0.65)
        order = jnp.argsort(mask.astype(jnp.int32), axis=-1, stable=True)
        vis_idx = order[:, :NVIS]
        mask_idx = order[:, NVIS:]
        p_cm = extract_patches(px, 16, 16, channel_major=True)
        p_cm = jnp.take_along_axis(p_cm, vis_idx[..., None], axis=1)
        patches = extract_patches(px, 16, 16, channel_major=False)
        patches = normalize_pixel_targets(patches)
        labels = jnp.take_along_axis(patches, mask_idx[..., None], axis=1)

        def loss(lg):
            return jnp.mean((lg.astype(jnp.float32)
                             - labels.astype(jnp.float32)) ** 2) \
                + jnp.sum(p_cm.astype(jnp.float32)) * 0.0
        return jax.value_and_grad(loss)(logits)[0]

    glue_in = [(jax.random.normal(jax.random.PRNGKey(60 + i),
                                  (B, 320, 1, 512, 512), jnp.bfloat16),
                jax.random.normal(jax.random.PRNGKey(70 + i),
                                  (B, NUM_MASKED, CFG.patch_dim),
                                  jnp.bfloat16))
               for i in range(4)]
    timeit("glue", glue, glue_in)

    # --- projection matmuls: patch embed (visible), enc->dec, head
    wpe = jax.random.normal(key, (CFG.patch_dim, 768), jnp.bfloat16) * 0.02
    we2d = jax.random.normal(key, (768, 384), jnp.bfloat16) * 0.02
    whead = jax.random.normal(key, (384, CFG.patch_dim), jnp.bfloat16) * 0.02

    @jax.jit
    def proj_fb(wpe, we2d, whead, pv):
        def loss(ws):
            a, b_, c = ws
            x = jnp.dot(pv, a, preferred_element_type=jnp.float32)
            x = x.astype(jnp.bfloat16)
            y = jnp.dot(jnp.pad(x, ((0, 0), (0, N - NVIS), (0, 0))), b_,
                        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
            z = jnp.dot(y[:, :NUM_MASKED], c,
                        preferred_element_type=jnp.float32)
            return jnp.sum(z)
        return jax.value_and_grad(loss)((wpe, we2d, whead))[0]

    timeit("proj", proj_fb,
           [(wpe, we2d, whead) + t
            for t in mk_inputs((B, NVIS, CFG.patch_dim))])

    # --- optimizer update on a videomae-pretrain-sized pytree
    from smb_vision_tpu.models.videomae import VideoMAEForPreTraining
    model = VideoMAEForPreTraining(CFG)
    mask0 = mim_mask(key, B, input_size=512, depth=320, mask_patch_size=32,
                     model_patch_size=16, mask_ratio=0.65)
    px0 = jnp.zeros((B, 320, 1, 512, 512), jnp.bfloat16)
    params = jax.jit(model.init, static_argnums=(3,))(
        key, px0, mask0, NUM_MASKED)
    tx = optax.adamw(1e-4)
    opt0 = tx.init(params)

    @jax.jit
    def opt_fb(params, opt0, seed):
        g = jax.tree_util.tree_map(
            lambda p: jnp.full(p.shape, seed, jnp.float32), params)
        up, _ = tx.update(g, opt0, params)
        newp = optax.apply_updates(params, up)
        return jnp.sum(jax.tree_util.tree_leaves(newp)[0])

    opt_in = [(params, opt0, jnp.float32(0.001 * i)) for i in range(5)]
    timeit("opt", opt_fb, opt_in)

    # --- the real full step
    from smb_vision_tpu.train.mim import make_mim_workload
    model, init_fn, step_fn, _ = make_mim_workload(
        CFG, mask_patch_size=32, mask_ratio=0.65, tx=tx)
    state = init_fn(key)
    step = jax.jit(step_fn, donate_argnums=(0,))
    batches = [{"pixel_values": jax.random.normal(
        jax.random.PRNGKey(10 + i), (B, 320, 1, 512, 512), jnp.bfloat16)}
        for i in range(4)]
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
