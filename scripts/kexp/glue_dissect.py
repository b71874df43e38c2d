"""Dissect the attention-glue chain: time qkv-only / out-only legs for
pallas vs XLA separately (12 reps per jit call, on-device inputs, scalar
readback) to locate where the layer-glue milliseconds go.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kexp/glue_dissect.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from smb_vision_tpu.ops.attn_glue import attn_out_residual, qkv_ln_forward

M, K = 20480, 768
REPS = 96
rng = np.random.default_rng(0)


def mk(shape, scale=1.0, dt=jnp.bfloat16):
    return jnp.asarray(rng.normal(size=shape) * scale, dt)


lnw = mk((K,), 0.1, jnp.float32) + 1
lnb = mk((K,), 0.1, jnp.float32)
wq, wk, wv, wo = (mk((K, K), 0.02, jnp.float32) for _ in range(4))
bq, bv, bo = (mk((K,), 0.02, jnp.float32) for _ in range(3))


def timed(name, build, flops):
    fn = jax.jit(build)
    fn(0).block_until_ready()
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(fn(i + 1))
        ts.append(time.perf_counter() - t0)
    t = min(ts) / REPS
    print(f"{name:18s} {t*1e3:7.3f} ms/rep   {flops/t/1e12:6.1f} TFLOP/s"
          f"   times {[f'{u*1e3:.1f}' for u in ts]}")


def qkv_chain(impl):
    def run(seed):
        x0 = jax.random.normal(jax.random.PRNGKey(seed), (M, K),
                               jnp.bfloat16)

        def body(c, _):
            q, k, v = qkv_ln_forward(c, lnw, lnb, wq, bq, wk, None,
                                     wv, bv, impl=impl)
            # chain through v only: no extra elementwise beyond one add
            return (v + q * 0 + k * 0).astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, x0, None, length=REPS)
        return (c.astype(jnp.float32) ** 2).mean()
    return run


def out_chain(impl):
    def run(seed):
        x0 = jax.random.normal(jax.random.PRNGKey(seed), (M, K),
                               jnp.bfloat16)

        def body(c, _):
            o = attn_out_residual(c, c, wo, bo, impl=impl)
            return o.astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, x0, None, length=REPS)
        return (c.astype(jnp.float32) ** 2).mean()
    return run


qkv_fl = 3 * 2 * M * K * K
out_fl = 2 * M * K * K
for impl in ("pallas", "xla"):
    timed(f"qkv[{impl}]", qkv_chain(impl), qkv_fl)
for impl in ("pallas", "xla"):
    timed(f"out[{impl}]", out_chain(impl), out_fl)
