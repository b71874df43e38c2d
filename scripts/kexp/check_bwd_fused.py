"""Interpret-mode numerics check of the fused single-pass backward vs
XLA autodiff grads, matching tolerance of the shipped two-pass bwd."""
import jax

jax.config.update("jax_platforms", "cpu")

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts/kexp")

import numpy as np
import jax.numpy as jnp

from bwd_fused import bwd_fused, LOG2E
from smb_vision_tpu.ops.attention import _fwd


def main():
    key = jax.random.PRNGKey(0)
    bh, n, d = 4, 512, 64
    ks = jax.random.split(key, 4)
    q = (jax.random.normal(ks[0], (bh, n, d)) * 0.6).astype(jnp.bfloat16)
    k = (jax.random.normal(ks[1], (bh, n, d)) * 0.6).astype(jnp.bfloat16)
    v = (jax.random.normal(ks[2], (bh, n, d)) * 0.6).astype(jnp.bfloat16)
    do = (jax.random.normal(ks[3], (bh, n, d)) * 0.6).astype(jnp.bfloat16)
    scale = 1.0 / np.sqrt(d)

    # XLA reference grads
    def attn(q, k, v):
        s = jnp.einsum("bqd,bkd->bqk", q.astype(jnp.float32),
                       k.astype(jnp.float32)) * scale
        p = jax.nn.softmax(s, axis=-1)
        return jnp.einsum("bqk,bkd->bqd", p, v.astype(jnp.float32))

    _, vjp = jax.vjp(attn, q, k, v)
    dq_r, dk_r, dv_r = [np.asarray(x, np.float32)
                        for x in vjp(do.astype(jnp.float32))]

    # fused kernel inputs: fwd to get out + lse
    out, lse = _fwd(q, k, v, scale=scale, block_q=128, block_k=128,
                    interpret=True)
    if lse.ndim == 3 and lse.shape[-1] == 128:
        lse = lse.reshape(bh, n)[..., None]
    delta = jnp.sum(do.astype(jnp.float32) * out.astype(jnp.float32),
                    axis=-1, keepdims=True)
    qs = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    dq, dk, dv = bwd_fused(qs, k, v, do, lse, delta, scale=scale,
                           block_q=128, block_k=128, interpret=True)

    for name, a, r in [("dq", dq, dq_r), ("dk", dk, dk_r), ("dv", dv, dv_r)]:
        a = np.asarray(a, np.float32)
        rel = np.abs(a - r).max() / max(np.abs(r).max(), 1e-6)
        status = "OK " if rel < 3e-2 else "FAIL"
        print(f"{status} {name} rel={rel:.5f}")
        assert rel < 3e-2, (name, rel)
    print("fused bwd numerics OK")


if __name__ == "__main__":
    main()
