"""Numerics check of every kernel variant vs XLA attention (interpret mode
on CPU). Run before any TPU timing."""
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts/kexp")

import numpy as np
import jax.numpy as jnp

from variants import VARIANTS


def xla_ref(q, k, v, scale):
    s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                   k.astype(jnp.float32)) * scale
    p = jax.nn.softmax(s, axis=-1)
    return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))


def main():
    key = jax.random.PRNGKey(0)
    bh, n, d = 4, 512, 64
    ks = jax.random.split(key, 3)
    q = (jax.random.normal(ks[0], (bh, n, d)) * 0.7).astype(jnp.bfloat16)
    k = (jax.random.normal(ks[1], (bh, n, d)) * 0.7).astype(jnp.bfloat16)
    v = (jax.random.normal(ks[2], (bh, n, d)) * 0.7).astype(jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)
    ref = np.asarray(xla_ref(q, k, v, scale))

    for name, fn in VARIANTS.items():
        if name.startswith("probe_"):
            continue  # timing probes, not real attention
        kwargs = dict(scale=scale, block_q=128, block_k=256, interpret=True)
        out = np.asarray(fn(q, k, v, **kwargs)).astype(np.float32)
        err = np.abs(out - ref).max()
        rel = err / np.abs(ref).max()
        status = "OK " if rel < 2e-2 else "FAIL"
        print(f"{status} {name:6s} max_abs_err={err:.5f} rel={rel:.5f}")
        assert rel < 2e-2, name


if __name__ == "__main__":
    main()
