"""Time kernel variants on the real v5e chip.

Protocol (see .claude/skills/verify/SKILL.md): per-call scalar readback,
distinct random inputs per call, 12 chained layer-equivalents inside one jit
to amortize the ~25ms relay call floor.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python time_tpu.py [variant ...]
"""
import sys
import time

sys.path.insert(0, "/root/repo/scripts/kexp")

import jax
import jax.numpy as jnp
import numpy as np

from variants import VARIANTS

H, N, D = 12, 20480, 64
LAYERS = 12
FLOPS_PER_LAYER = 4 * N * N * D * H  # qk + pv


def make_fn(name, **kw):
    fn = VARIANTS[name]
    scale = 1.0 / np.sqrt(D)

    @jax.jit
    def run(q, k, v):
        out = q
        for _ in range(LAYERS):
            out = fn(out.astype(jnp.bfloat16), k, v, scale=scale, **kw)
        return jnp.sum(out.astype(jnp.float32))

    return run


def main():
    names = sys.argv[1:] or list(VARIANTS)
    import os
    blocks = eval(os.environ.get("KEXP_BLOCKS", "[(1024, 1024), (2048, 2048)]"))
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0].device_kind}; shape H={H} N={N} D={D},"
          f" {LAYERS} layers/call")
    for name in names:
        for bq, bk in blocks:
            run = make_fn(name, block_q=bq, block_k=bk)
            ks = jax.random.split(jax.random.PRNGKey(42), 3)
            q = (jax.random.normal(ks[0], (H, N, D)) * 0.5).astype(jnp.bfloat16)
            k = (jax.random.normal(ks[1], (H, N, D)) * 0.5).astype(jnp.bfloat16)
            v = (jax.random.normal(ks[2], (H, N, D)) * 0.5).astype(jnp.bfloat16)
            try:
                t0 = time.perf_counter()
                float(run(q, k, v))  # compile + warmup
                t_compile = time.perf_counter() - t0
            except Exception as e:  # noqa: BLE001
                print(f"{name} bq={bq} bk={bk}: FAILED {type(e).__name__}: "
                      f"{str(e)[:200]}")
                continue
            times = []
            for i in range(3):
                kk = jax.random.split(jax.random.PRNGKey(100 + i), 3)
                qi = (jax.random.normal(kk[0], (H, N, D)) * 0.5).astype(
                    jnp.bfloat16)
                ki = (jax.random.normal(kk[1], (H, N, D)) * 0.5).astype(
                    jnp.bfloat16)
                vi = (jax.random.normal(kk[2], (H, N, D)) * 0.5).astype(
                    jnp.bfloat16)
                jax.block_until_ready((qi, ki, vi))
                t0 = time.perf_counter()
                float(run(qi, ki, vi))
                times.append(time.perf_counter() - t0)
            per_layer = min(times) / LAYERS
            tflops = FLOPS_PER_LAYER / per_layer / 1e12
            print(f"{name:5s} bq={bq:5d} bk={bk:5d}: {per_layer*1e3:7.2f} "
                  f"ms/layer  {tflops:6.1f} TFLOP/s "
                  f"({tflops/197*100:4.1f}% peak)  compile {t_compile:.0f}s "
                  f"times_ms={[round(t*1e3) for t in times]}")


if __name__ == "__main__":
    main()
