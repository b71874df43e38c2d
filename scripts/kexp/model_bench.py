"""Model-level 512^2x320 embed throughput at d64 (reference arch) and d128
(TPU-recommended), with the integrated round-2 kernel. Honest protocol:
distinct inputs + scalar readback per call."""
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from smb_vision_tpu.models.configs import VideoMAEConfig
from smb_vision_tpu.models.videomae import VideoMAEModel


def run(heads, batch=1, iters=4):
    config = VideoMAEConfig(image_size=512, num_frames=320, patch_size=16,
                            tubelet_size=16, num_channels=1,
                            num_attention_heads=heads,
                            dtype="bfloat16", attn_impl="auto")
    model = VideoMAEModel(config)
    key = jax.random.PRNGKey(0)
    px = jax.random.normal(key, (batch, 320, 1, 512, 512), jnp.bfloat16)
    params = jax.jit(model.init)(key, px)

    @jax.jit
    def encode_sum(params, px):
        out, _ = model.apply(params, px)
        return jnp.sum(out.astype(jnp.float32))

    float(encode_sum(params, px))
    inputs = [jax.random.normal(jax.random.PRNGKey(100 + i), px.shape,
                                jnp.bfloat16) for i in range(iters)]
    jax.block_until_ready(inputs)
    t0 = time.perf_counter()
    for x in inputs:
        float(encode_sum(params, x))
    dt = time.perf_counter() - t0
    vps = iters * batch / dt
    print(f"heads={heads:2d} (d{768//heads}) batch={batch}: "
          f"{vps:.3f} vol/s  ({dt/iters*1e3:.0f} ms/vol-call)")
    return vps


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    for heads in (12, 6):
        for batch in (1, 2):
            run(heads, batch)
