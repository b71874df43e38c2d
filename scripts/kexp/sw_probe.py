"""Isolate the slow piece of the sliding-window program: (a) the vmapped
dynamic_slice window gather, (b) the ViT encode on pre-sliced windows,
(c) gather+encode fused."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from smb_vision_tpu.models.configs import VideoMAEConfig
from smb_vision_tpu.models.videomae import VideoMAEModel

ROI = (256, 256, 160)


def timed(label, fn, args_sets):
    float(fn(*args_sets[0]))
    ts = []
    for a in args_sets[1:]:
        t0 = time.perf_counter()
        float(fn(*a))
        ts.append(time.perf_counter() - t0)
    print(f"{label:24s} {min(ts)*1e3:8.0f} ms")


def main():
    print("device:", jax.devices()[0].device_kind)
    cfg = VideoMAEConfig(image_size=256, num_frames=160, patch_size=16,
                         tubelet_size=16, num_channels=1,
                         dtype="bfloat16", attn_impl="auto")
    model = VideoMAEModel(cfg)
    key = jax.random.PRNGKey(0)
    params = jax.jit(model.init)(
        key, jnp.zeros((2, 160, 1, 256, 256), jnp.bfloat16))

    vols = [jax.random.normal(jax.random.PRNGKey(i), (1, 1, 320, 320, 224),
                              jnp.bfloat16) for i in range(3)]
    starts = jnp.asarray(np.array([[0, 0, 0], [64, 64, 64]], np.int32))

    def get_window(vol, s):
        return jax.lax.dynamic_slice(
            vol, (0, 0, s[0], s[1], s[2]), (1, 1, *ROI))

    @jax.jit
    def gather_only(vol, starts):
        wins = jax.vmap(lambda s: get_window(vol, s))(starts)
        return jnp.sum(wins.astype(jnp.float32))

    timed("vmap dynamic_slice x2", gather_only,
          [(v, starts) for v in vols])

    wins_sets = [jax.random.normal(jax.random.PRNGKey(10 + i),
                                   (2, 160, 1, 256, 256), jnp.bfloat16)
                 for i in range(3)]

    @jax.jit
    def encode2(p, px):
        out, _ = model.apply(p, px)
        return jnp.sum(out.astype(jnp.float32))

    timed("encode 2 windows", encode2, [(params, w) for w in wins_sets])

    @jax.jit
    def fused(p, vol, starts):
        wins = jax.vmap(lambda s: get_window(vol, s))(starts)
        px = jnp.transpose(wins[:, 0], (0, 4, 1, 2, 3))
        out, _ = model.apply(p, px.astype(jnp.bfloat16))
        return jnp.sum(out.astype(jnp.float32))

    timed("gather+encode fused", fused, [(params, v, starts) for v in vols])

    # unvmapped: two static dynamic_slices (loop-unrolled on starts values)
    @jax.jit
    def fused_static(p, vol):
        w0 = jax.lax.dynamic_slice(vol, (0, 0, 0, 0, 0), (1, 1, *ROI))
        w1 = jax.lax.dynamic_slice(vol, (0, 0, 64, 64, 64), (1, 1, *ROI))
        wins = jnp.concatenate([w0, w1], axis=0)
        px = jnp.transpose(wins, (0, 4, 1, 2, 3))
        out, _ = model.apply(p, px.astype(jnp.bfloat16))
        return jnp.sum(out.astype(jnp.float32))

    timed("static-slice+encode", fused_static, [(params, v) for v in vols])


if __name__ == "__main__":
    main()
