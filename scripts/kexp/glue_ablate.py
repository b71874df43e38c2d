"""Sub-ablation of the MIM step's data plumbing ("glue") on the TPU.
Each probe folds REPS=8 independent repetitions into one jit call to
amortize the ~25 ms relay floor; per-rep time is reported."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from smb_vision_tpu.ops.patches import extract_patches, normalize_pixel_targets
from smb_vision_tpu.ops.masking import mim_mask

N = 20480
NVIS = 7168
REPS = 8
B = 1


def timeit(label, fn, mk_args, n=3):
    fn(*mk_args(0))
    times = []
    for i in range(n):
        args = mk_args(100 + i)
        jax.block_until_ready(args)
        t0 = time.perf_counter()
        float(fn(*args))
        times.append(time.perf_counter() - t0)
    per = min(times) / REPS
    print(f"{label:22s} {per*1e3:8.2f} ms/rep  "
          f"{[round(t*1e3) for t in times]}")


def vol_args(seed):
    return (jax.random.normal(jax.random.PRNGKey(seed),
                              (B, 320, 1, 512, 512), jnp.bfloat16),)


def main():
    print("device:", jax.devices()[0].device_kind, f"REPS={REPS}")

    @jax.jit
    def p_mask(px):
        acc = 0.0
        for r in range(REPS):
            m = mim_mask(jax.random.PRNGKey(r), B, input_size=512, depth=320,
                         mask_patch_size=32, model_patch_size=16,
                         mask_ratio=0.65)
            acc += jnp.sum(m.astype(jnp.float32)) + jnp.sum(px[0, 0, 0, 0])
        return acc

    timeit("mim_mask", p_mask, vol_args)

    @jax.jit
    def p_argsort(px):
        acc = 0.0
        for r in range(REPS):
            m = mim_mask(jax.random.PRNGKey(r), B, input_size=512, depth=320,
                         mask_patch_size=32, model_patch_size=16,
                         mask_ratio=0.65)
            order = jnp.argsort(m.astype(jnp.int32), axis=-1, stable=True)
            acc += jnp.sum(order) + jnp.sum(px[0, 0, 0, 0])
        return acc

    timeit("mask+argsort", p_argsort, vol_args)

    @jax.jit
    def p_extract(px):
        acc = 0.0
        for r in range(REPS):
            p = extract_patches(px + r, 16, 16, channel_major=True)
            acc += jnp.sum(p[:, ::128, ::64].astype(jnp.float32))
        return acc

    timeit("extract_patches", p_extract, vol_args)

    @jax.jit
    def p_norm(px):
        acc = 0.0
        for r in range(REPS):
            p = extract_patches(px + r, 16, 16, channel_major=False)
            p = normalize_pixel_targets(p)
            acc += jnp.sum(p[:, ::128, ::64].astype(jnp.float32))
        return acc

    timeit("extract+norm", p_norm, vol_args)

    @jax.jit
    def p_gather(px):
        acc = 0.0
        p = extract_patches(px, 16, 16, channel_major=True)
        for r in range(REPS):
            m = mim_mask(jax.random.PRNGKey(r), B, input_size=512, depth=320,
                         mask_patch_size=32, model_patch_size=16,
                         mask_ratio=0.65)
            order = jnp.argsort(m.astype(jnp.int32), axis=-1, stable=True)
            vis = jnp.take_along_axis(p, order[:, :NVIS, None], axis=1)
            acc += jnp.sum(vis[:, ::64, ::64].astype(jnp.float32))
        return acc

    timeit("extract(1)+8x(gather)", p_gather, vol_args)


if __name__ == "__main__":
    main()
