"""lax.map vs unrolled chunks for the sliding-window program: the piece
probe showed gather+encode at 46 ms per 2-window chunk, yet the mapped
8-window program ran 42 s."""
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
    print(f"{label:28s} {min(ts)*1e3:8.0f} ms")


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
    starts = np.array([[0, 0, 0], [0, 0, 64], [0, 64, 0], [0, 64, 64],
                       [64, 0, 0], [64, 0, 64], [64, 64, 0], [64, 64, 64]],
                      np.int32)
    chunked = jnp.asarray(starts.reshape(4, 2, 3))

    def get_window(vol, s):
        return jax.lax.dynamic_slice(
            vol, (0, 0, s[0], s[1], s[2]), (1, 1, *ROI))

    def body(vol, p, batch_starts):
        wins = jax.vmap(lambda s: get_window(vol, s))(batch_starts)
        px = jnp.transpose(wins[:, 0], (0, 4, 1, 2, 3))
        out, _ = model.apply(p, px.astype(jnp.bfloat16))
        return out

    @jax.jit
    def mapped(p, vol, chunked):
        emb = jax.lax.map(lambda c: body(vol, p, c), chunked)
        return jnp.sum(emb.astype(jnp.float32))

    timed("lax.map 4 chunks", mapped, [(params, v, chunked) for v in vols])

    @jax.jit
    def unrolled(p, vol, chunked):
        acc = jnp.zeros((), jnp.float32)
        for i in range(4):
            acc += jnp.sum(body(vol, p, chunked[i]).astype(jnp.float32))
        return acc

    timed("unrolled 4 chunks", unrolled, [(params, v, chunked) for v in vols])

    @jax.jit
    def one_big(p, vol, chunked):
        flat = chunked.reshape(8, 3)
        emb = body(vol, p, flat)
        return jnp.sum(emb.astype(jnp.float32))

    timed("one 8-window batch", one_big, [(params, v, chunked) for v in vols])


if __name__ == "__main__":
    main()
