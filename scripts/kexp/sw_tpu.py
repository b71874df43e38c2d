"""Sliding-window embedding on the REAL TPU at scale (round-3 backlog: it
was previously only exercised on CPU). Drives sliding_window_embed with a
jitted ViT-Base encoder over a volume larger than the model grid, checks
one window's embedding equals a direct encoder call, and times the sweep."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from smb_vision_tpu.models.configs import VideoMAEConfig
from smb_vision_tpu.models.videomae import VideoMAEModel
from smb_vision_tpu.inference.sliding_window import sliding_window_embed


def main():
    print("device:", jax.devices()[0].device_kind)
    cfg = VideoMAEConfig(image_size=256, num_frames=160, patch_size=16,
                         tubelet_size=16, num_channels=1,
                         dtype="bfloat16", attn_impl="auto")
    model = VideoMAEModel(cfg)
    key = jax.random.PRNGKey(0)
    px0 = jnp.zeros((1, 160, 1, 256, 256), jnp.bfloat16)
    params = jax.jit(model.init)(key, px0)

    def window_embedder(p, wins):
        # params as an argument: captured arrays would be inlined as HLO
        # constants and the relay rejects ViT-sized programs (HTTP 413)
        px = jnp.transpose(wins, (0, 4, 1, 2, 3))  # (N,C,h,w,d)->(N,d,C,h,w)
        return model.apply(p, px.astype(jnp.bfloat16))[0]

    roi = (256, 256, 160)
    vol = jax.random.normal(jax.random.PRNGKey(1), (1, 1, 320, 320, 224),
                            jnp.bfloat16)

    t0 = time.perf_counter()
    emb, starts = sliding_window_embed(vol, roi, window_embedder,
                                       overlap=0.25, sw_batch_size=2,
                                       pool=True, mode="gaussian",
                                       token_grid=cfg.grid, state=params)
    emb = np.asarray(emb, np.float32)
    t_compile = time.perf_counter() - t0
    print(f"windows: {len(starts)}, emb {emb.shape}, compile+run "
          f"{t_compile:.0f}s")
    assert emb.shape == (1, len(starts), cfg.hidden_size)
    assert np.isfinite(emb).all()

    # timed second volume (distinct input). The eager random_normal is
    # itself a multi-second relay op and block_until_ready does NOT await
    # it — force materialization with a scalar readback BEFORE timing.
    vol2 = jax.random.normal(jax.random.PRNGKey(2), vol.shape, jnp.bfloat16)
    float(jnp.sum(vol2.astype(jnp.float32)))
    t0 = time.perf_counter()
    emb2, _ = sliding_window_embed(vol2, roi, window_embedder, overlap=0.25,
                                   sw_batch_size=2, pool=True,
                                   mode="gaussian", token_grid=cfg.grid,
                                   state=params)
    emb2 = np.asarray(emb2, np.float32)
    dt = time.perf_counter() - t0
    print(f"sweep: {dt*1e3:.0f} ms for {len(starts)} windows "
          f"({dt/len(starts)*1e3:.0f} ms/window)")

    # third volume: warm path again (isolates one-time eager-op cost)
    vol3 = jax.random.normal(jax.random.PRNGKey(3), vol.shape, jnp.bfloat16)
    float(jnp.sum(vol3.astype(jnp.float32)))
    t0 = time.perf_counter()
    emb3, _ = sliding_window_embed(vol3, roi, window_embedder, overlap=0.25,
                                   sw_batch_size=2, pool=True,
                                   mode="gaussian", token_grid=cfg.grid,
                                   state=params)
    emb3 = np.asarray(emb3, np.float32)
    dt = time.perf_counter() - t0
    print(f"sweep2: {dt*1e3:.0f} ms ({dt/len(starts)*1e3:.0f} ms/window)")

    # cross-check one window vs a direct encoder call (constant mode,
    # mean-pooled == plain token mean)
    embc, startsc = sliding_window_embed(vol2, roi, window_embedder,
                                         overlap=0.25, sw_batch_size=2,
                                         pool=True, mode="constant",
                                         state=params)
    s = startsc[0]
    win = jax.lax.dynamic_slice(vol2, (0, 0, int(s[0]), int(s[1]), int(s[2])),
                                (1, 1) + roi)
    direct = np.asarray(
        jnp.mean(window_embedder(params, win).astype(jnp.float32), axis=1))
    got = np.asarray(embc, np.float32)[0, 0]
    rel = np.abs(got - direct[0]).max() / max(np.abs(direct).max(), 1e-6)
    print(f"window-0 vs direct rel err: {rel:.6f}")
    assert rel < 2e-3, rel
    print("SLIDING-WINDOW TPU OK")


if __name__ == "__main__":
    main()
