"""Time the first-party inflated-3D ResNet (Merlin image tower) on the
real TPU chip at the Merlin production geometry.

The reference embeds CT volumes through the external `merlin` package's
I3D ResNet-152 on GPU (reference src/encoders/run_merlin.py:24-48); this
harness drives models/resnet3d.py — the TPU-path replacement — end to
end: jitted init + forward at (B, 1, 224, 224, 160), bf16 compute.

Methodology (CLAUDE.md relay rules): params passed as jit ARGUMENTS
(never closed over — HLO-constant inlining trips the relay's 413 limit),
per-call scalar readback, DISTINCT random inputs per timed call (the
relay memoizes repeat calls), warmup excluded.

Usage:
    PYTHONPATH=/root/repo:/root/.axon_site python scripts/kexp/resnet_tpu.py \
        [--depth 152] [--batch 1] [--iters 4]
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np

from smb_vision_tpu.models.configs import ResNet3DConfig
from smb_vision_tpu.models.resnet3d import ResNet3D

STAGES = {50: (3, 4, 6, 3), 101: (3, 4, 23, 3), 152: (3, 8, 36, 3)}


def conv_flops_resnet3d(cfg, in_shape):
    """Dense MAC*2 count of every conv in the tower at `in_shape` =
    (a0, a1, a2). Mirrors the forward's stride plan exactly."""
    total = 0

    def conv(out_c, in_c, k, shape, stride):
        nonlocal total
        o = tuple((s + st - 1) // st for s, st in zip(shape, stride))
        total += 2 * out_c * in_c * int(np.prod(k)) * int(np.prod(o))
        return o

    ts = cfg.stem_stride_t
    shape = conv(cfg.base_width, cfg.num_channels,
                 (cfg.stem_kernel_t, 7, 7), in_shape, (ts, 2, 2))
    shape = tuple((s + st - 1) // st
                  for s, st in zip(shape, (cfg.pool_stride_t, 2, 2)))
    in_c = cfg.base_width
    for i, n in enumerate(cfg.stage_sizes):
        w = cfg.base_width * (2 ** i)
        sp = 1 if i == 0 else 2
        st = sp if cfg.temporal_downsample else 1
        for j in range(n):
            stride = (st, sp, sp) if j == 0 else (1, 1, 1)
            conv(w, in_c, (1, 1, 1), shape, (1, 1, 1))
            out_shape = conv(w, w, (cfg.conv2_kernel_t, 3, 3), shape,
                             stride)
            conv(w * cfg.expansion, w, (1, 1, 1), out_shape, (1, 1, 1))
            if j == 0:
                conv(w * cfg.expansion, in_c, (1, 1, 1), shape, stride)
            shape = out_shape
            in_c = w * cfg.expansion
    return total


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--depth", type=int, default=152,
                    choices=sorted(STAGES))
    ap.add_argument("--batch", type=int, default=1)
    ap.add_argument("--size", type=int, nargs=3, default=(224, 224, 160))
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    dev = jax.devices()[0]
    print("device:", dev, flush=True)

    cfg = ResNet3DConfig(stage_sizes=STAGES[args.depth], num_channels=1,
                         num_labels=0)
    model = ResNet3D(cfg)
    shape = (args.batch, 1, *args.size)

    t0 = time.time()
    params = jax.jit(
        lambda k: model.init(k, jnp.zeros(shape, jnp.bfloat16))
    )(jax.random.key(0))
    jax.block_until_ready(params)
    n_params = sum(int(np.prod(x.shape))
                   for x in jax.tree_util.tree_leaves(params))
    print(f"init: {time.time() - t0:.1f}s  params={n_params / 1e6:.1f}M",
          flush=True)

    @jax.jit
    def fwd(p, px):
        tokens, pooled = model.apply(p, px)
        return pooled.sum()  # scalar readback forces full execution

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
    t0 = time.time()
    s = float(fwd(params, x))
    print(f"compile+first call: {time.time() - t0:.1f}s  scalar={s:.4f}",
          flush=True)

    times = []
    for i in range(args.iters):
        x = jnp.asarray(rng.normal(size=shape).astype(np.float32))
        jax.block_until_ready(x)
        t0 = time.time()
        s = float(fwd(params, x))  # scalar float() = real readback
        dt = time.time() - t0
        times.append(dt)
        print(f"iter {i}: {dt * 1e3:.1f} ms  scalar={s:.4f}", flush=True)

    best = min(times)
    fl = conv_flops_resnet3d(cfg, tuple(args.size)) * args.batch
    print(f"resnet{args.depth}-i3d b{args.batch} {args.size}: "
          f"best {best * 1e3:.1f} ms  vol/s {args.batch / best:.2f}  "
          f"conv TFLOP {fl / 1e12:.2f}  eff {fl / best / 1e12:.1f} TFLOP/s",
          flush=True)


if __name__ == "__main__":
    main()
