"""Dissect the full-res MIM FORWARD: encoder, decoder, glue, and the
whole pretraining loss, each REPS-folded into one jit call. Locates the
gap between the analytic component sum and the measured ~96 ms fwd."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from smb_vision_tpu.models.configs import VideoMAEConfig
from smb_vision_tpu.models.layers import Encoder
from smb_vision_tpu.models.videomae import VideoMAEForPreTraining
from smb_vision_tpu.ops.masking import mim_mask, num_masked_tokens

B = 1
REPS = 4
NVIS = 7168
NMASK = num_masked_tokens(512, 320, 32, 16, 0.65)

CFG = VideoMAEConfig(image_size=512, num_frames=320, patch_size=16,
                     tubelet_size=16, num_channels=1,
                     num_attention_heads=12, norm_pix_loss=True,
                     dtype="bfloat16", attn_impl="auto")


def timeit(label, fn, mk_args, n=3):
    float(fn(*mk_args(0)))
    ts = []
    for i in range(n):
        a = mk_args(100 + i)
        jax.block_until_ready(a)
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{label:26s} {min(ts)/REPS*1e3:8.2f} ms/rep")


def main():
    print("device:", jax.devices()[0].device_kind, f"REPS={REPS}")
    key = jax.random.PRNGKey(0)

    # a) encoder stack alone at visible-token count
    enc = Encoder(num_layers=12, hidden_size=768, num_heads=12,
                  intermediate_size=3072, bias_mode="qv",
                  dtype=jnp.bfloat16, attn_impl="auto", name="enc")
    x0 = jax.random.normal(key, (B, NVIS, 768), jnp.bfloat16)
    ep = jax.jit(enc.init)(key, x0)

    @jax.jit
    def p_enc(p, x):
        acc = 0.0
        for r in range(REPS):
            acc += jnp.sum(enc.apply(p, x + r).astype(jnp.float32))
        return acc

    def enc_args(s):
        return (ep, jax.random.normal(jax.random.PRNGKey(s),
                                      (B, NVIS, 768), jnp.bfloat16))

    timeit("encoder 12L@7168", p_enc, enc_args)

    # b) decoder stack at full length
    dec = Encoder(num_layers=4, hidden_size=384, num_heads=6,
                  intermediate_size=1536, bias_mode="qv",
                  dtype=jnp.bfloat16, attn_impl="auto", name="dec")
    y0 = jax.random.normal(key, (B, 20480, 384), jnp.bfloat16)
    dp = jax.jit(dec.init)(key, y0)

    @jax.jit
    def p_dec(p, y):
        acc = 0.0
        for r in range(REPS):
            acc += jnp.sum(dec.apply(p, y + r).astype(jnp.float32))
        return acc

    def dec_args(s):
        return (dp, jax.random.normal(jax.random.PRNGKey(s),
                                      (B, 20480, 384), jnp.bfloat16))

    timeit("decoder 4L@20480", p_dec, dec_args)

    # c) the whole pretraining forward (loss), REPS-folded
    model = VideoMAEForPreTraining(CFG)
    mask0 = mim_mask(key, B, input_size=512, depth=320, mask_patch_size=32,
                     model_patch_size=16, mask_ratio=0.65)
    px0 = jnp.zeros((B, 320, 1, 512, 512), jnp.bfloat16)
    mp = jax.jit(model.init, static_argnums=(3,))(key, px0, mask0, NMASK)

    @jax.jit
    def p_full(p, px):
        acc = 0.0
        for r in range(REPS):
            m = mim_mask(jax.random.PRNGKey(r), B, input_size=512,
                         depth=320, mask_patch_size=32, model_patch_size=16,
                         mask_ratio=0.65)
            out = model.apply(p, px + r, m, NMASK)
            acc += out["loss"].astype(jnp.float32)
        return acc

    def full_args(s):
        return (mp, jax.random.normal(jax.random.PRNGKey(s),
                                      (B, 320, 1, 512, 512), jnp.bfloat16))

    timeit("FULL pretrain fwd", p_full, full_args)


if __name__ == "__main__":
    main()
