"""Same-session A/B of the bwd sub-block unroll at the d64 flagship
shape: monkeypatch _pick_unroll so fwd stays u4 while bwd sweeps."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import smb_vision_tpu.ops.attention as A

H, N, D = 12, 20480, 64
LAYERS = 12
FLOPS_EFF = 4 * N * N * D * H * 3.5


def mk(i):
    ks = jax.random.split(jax.random.PRNGKey(i), 3)
    return [(jax.random.normal(kk, (H, N, D)) * 0.5).astype(jnp.bfloat16)
            for kk in ks]


def main():
    print("device:", jax.devices()[0].device_kind)
    scale = 1 / np.sqrt(D)
    cache = {}
    orig = A._pick_unroll

    def bench(u):
        A._pick_unroll = lambda bk, _u=u: _u if bk % _u == 0 else 1

        @jax.jit
        def fb(q, k, v):
            def loss(q):
                out = q
                for _ in range(LAYERS):
                    out = A._flash(out, k, v, scale, 4096, 2048, False)
                return jnp.sum(out.astype(jnp.float32) ** 2)
            return jnp.sum(jax.grad(loss)(q).astype(jnp.float32))

        def run(i):
            if i not in cache:
                cache[i] = mk(i)
            q, k, v = cache[i]
            return fb(q, k, v)

        float(run(0))
        ts = []
        for i in range(3):
            t0 = time.perf_counter()
            float(run(100 + i))
            ts.append(time.perf_counter() - t0)
        t = min(ts) / LAYERS
        print(f"bwd u={u}: fwd+bwd {t*1e3:6.2f} ms/layer "
              f"{FLOPS_EFF/t/1e12:6.1f} TFLOP/s eff")
        A._pick_unroll = orig

    for u in (1, 2, 4):
        bench(u)


if __name__ == "__main__":
    main()
