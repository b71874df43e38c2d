"""On-chip check + timing of the fused attention-glue kernels
(ops/attn_glue.py): compiled numerics vs the XLA chain, then layer-equiv
timings of both paths at the flagship embed shape (512^2x320/p16 ->
20480 tokens, ViT-Base 768).

Timing discipline per CLAUDE.md: >=12 layer-equivalents per jit call,
distinct inputs per call, scalar readback.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/kexp/glue_kernels.py
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from smb_vision_tpu.ops.attn_glue import (
    _out_xla,
    _qkv_xla,
    attn_out_residual,
    qkv_ln_forward,
)

M, K = 20480, 768
LAYERS = 12
rng = np.random.default_rng(0)


def mk(shape, scale=1.0, dt=jnp.bfloat16):
    return jnp.asarray(rng.normal(size=shape) * scale, dt)


x = mk((M, K))
lnw = mk((K,), 0.1, jnp.float32) + 1
lnb = mk((K,), 0.1, jnp.float32)
wq, wk, wv, wo = (mk((K, K), 0.02, jnp.float32) for _ in range(4))
bq, bv, bo = (mk((K,), 0.02, jnp.float32) for _ in range(3))
y = mk((M, K))

# ---- compiled numerics on chip ----
qp, kp, vp = jax.jit(lambda *a: qkv_ln_forward(*a, impl="pallas"))(
    x, lnw, lnb, wq, bq, wk, None, wv, bv)
qx, kx, vx = jax.jit(lambda *a: qkv_ln_forward(*a, impl="xla"))(
    x, lnw, lnb, wq, bq, wk, None, wv, bv)
for a, b, n in ((qp, qx, "q"), (kp, kx, "k"), (vp, vx, "v")):
    err = float(jnp.max(jnp.abs(a.astype(jnp.float32)
                                - b.astype(jnp.float32))))
    s = float(jnp.max(jnp.abs(b.astype(jnp.float32))))
    print(f"{n}: maxabs {err:.3g} (scale {s:.3g}, rel {err/s:.2e})")
    assert err / s < 2e-2

op = jax.jit(lambda *a: attn_out_residual(*a, impl="pallas"))(x, y, wo, bo)
ox = jax.jit(lambda *a: attn_out_residual(*a, impl="xla"))(x, y, wo, bo)
err = float(jnp.max(jnp.abs(op.astype(jnp.float32)
                            - ox.astype(jnp.float32))))
s = float(jnp.max(jnp.abs(ox.astype(jnp.float32))))
print(f"out: maxabs {err:.3g} (rel {err/s:.2e})")
assert err / s < 2e-2


# ---- timing: LAYERS glue-equivalents per jit call ----
def chain(fn_qkv, fn_out):
    def run(seed):
        # distinct input per call, generated ON DEVICE (a host-fresh
        # (M,K) bf16 array is 31.5 MB = ~0.8 s through the relay link,
        # which would swamp the ~15 ms of compute being measured)
        x0 = jax.random.normal(jax.random.PRNGKey(seed), (M, K),
                               jnp.bfloat16)

        def body(c, _):
            q, k, v = fn_qkv(c, lnw, lnb, wq, bq, wk, None, wv, bv)
            # stand-in mix so the glue chain stays data-dependent without
            # attention cost: c' = out_res(c, q*k + v)
            mix = (q * k + v).astype(jnp.bfloat16)
            c = fn_out(c, mix, wo, bo)
            return c.astype(jnp.bfloat16), ()
        c, _ = jax.lax.scan(body, x0, None, length=LAYERS)
        return (c.astype(jnp.float32) ** 2).mean()
    return jax.jit(run)


pall = chain(lambda *a: qkv_ln_forward(*a, impl="pallas"),
             lambda *a: attn_out_residual(*a, impl="pallas"))
xla = chain(lambda *a: qkv_ln_forward(*a, impl="xla"),
            lambda *a: attn_out_residual(*a, impl="xla"))

flops_layer = 2 * M * K * K * 4          # qkv (3) + out (1) projections
for name, fn in (("pallas", pall), ("xla", xla)):
    fn(0).block_until_ready()            # compile
    ts = []
    for i in range(5):
        t0 = time.perf_counter()
        val = float(fn(i + 1))
        ts.append(time.perf_counter() - t0)
    t = min(ts) / LAYERS
    print(f"{name}: {t*1e3:.3f} ms/layer-glue  "
          f"{flops_layer/t/1e12:.1f} TFLOP/s  (val {val:.4f}, "
          f"times {[f'{u*1e3:.1f}' for u in ts]})")
