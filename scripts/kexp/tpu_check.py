"""On-TPU validation of the integrated flash kernel: numerics vs XLA
(fwd + grads) on the compiled kernel, then fwd and fwd+bwd timing at the
flagship shape. (VERDICT r1 weakness 8: kernel numerics were only ever
asserted in interpret mode on CPU.)"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, "/root/repo")

from smb_vision_tpu.ops.attention import attention, xla_attention

H, N, D = 12, 20480, 64
LAYERS = 12
FLOPS_FWD = 4 * N * N * D * H


def check_numerics():
    key = jax.random.PRNGKey(0)
    B, n, h, d = 2, 2048, 4, 64
    ks = jax.random.split(key, 3)
    q, k, v = [(jax.random.normal(kk, (B, n, h, d)) * 0.6).astype(jnp.bfloat16)
               for kk in ks]

    @jax.jit
    def both(q, k, v):
        return (attention(q, k, v, impl="pallas"),
                xla_attention(q, k, v))

    out_p, out_x = both(q, k, v)
    out_p, out_x = np.asarray(out_p, np.float32), np.asarray(out_x, np.float32)
    rel = np.abs(out_p - out_x).max() / np.abs(out_x).max()
    print(f"fwd  rel err pallas-vs-xla on TPU: {rel:.5f}")
    assert rel < 2e-2, rel

    @jax.jit
    def gp(q, k, v):
        return jax.grad(lambda q, k, v: jnp.sum(
            attention(q, k, v, impl="pallas").astype(jnp.float32) ** 2),
            argnums=(0, 1, 2))(q, k, v)

    @jax.jit
    def gx(q, k, v):
        return jax.grad(lambda q, k, v: jnp.sum(
            xla_attention(q, k, v).astype(jnp.float32) ** 2),
            argnums=(0, 1, 2))(q, k, v)

    for name, a, b in zip("qkv", gp(q, k, v), gx(q, k, v)):
        a, b = np.asarray(a, np.float32), np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-6)
        print(f"grad d{name} rel err: {rel:.5f}")
        assert rel < 3e-2, (name, rel)

    # int8-score inference path (incl. the sub-block unroll), compiled
    @jax.jit
    def i8(q, k, v):
        return attention(q, k, v, impl="pallas_int8")

    out_i = np.asarray(i8(q, k, v), np.float32)
    rel = np.abs(out_i - out_x).max() / np.abs(out_x).max()
    print(f"int8 fwd rel err vs xla on TPU: {rel:.5f}")
    assert rel < 2e-2, rel

    # int8 p@v path (per-sub-block p requantization), compiled
    @jax.jit
    def i8pv(q, k, v):
        return attention(q, k, v, impl="pallas_int8pv")

    out_i = np.asarray(i8pv(q, k, v), np.float32)
    rel = np.abs(out_i - out_x).max() / np.abs(out_x).max()
    print(f"int8pv fwd rel err vs xla on TPU: {rel:.5f}")
    assert rel < 3e-2, rel
    print("NUMERICS OK (compiled TPU kernel)")


def timeit(tag, run, n_in=3):
    float(run(0))  # compile
    times = []
    for i in range(n_in):
        t0 = time.perf_counter()
        float(run(100 + i))
        times.append(time.perf_counter() - t0)
    per_layer = min(times) / LAYERS
    return per_layer


def bench():
    def mk(i):
        ks = jax.random.split(jax.random.PRNGKey(i), 3)
        return [(jax.random.normal(kk, (H, N, D)) * 0.5).astype(jnp.bfloat16)
                for kk in ks]

    from smb_vision_tpu.ops.attention import _flash

    scale = 1 / np.sqrt(D)

    @jax.jit
    def fwd_many(q, k, v):
        out = q
        for _ in range(LAYERS):
            out = _flash(out, k, v, scale, 4096, 2048, False)
        return jnp.sum(out.astype(jnp.float32))

    @jax.jit
    def fwdbwd_many(q, k, v):
        def loss(q):
            out = q
            for _ in range(LAYERS):
                out = _flash(out, k, v, scale, 4096, 2048, False)
            return jnp.sum(out.astype(jnp.float32) ** 2)
        return jnp.sum(jax.grad(loss)(q).astype(jnp.float32))

    cache = {}

    def run_f(i):
        if i not in cache:
            cache[i] = mk(i)
        q, k, v = cache[i]
        return fwd_many(q, k, v)

    def run_fb(i):
        if i not in cache:
            cache[i] = mk(i)
        q, k, v = cache[i]
        return fwdbwd_many(q, k, v)

    t = timeit("fwd", run_f)
    print(f"fwd:     {t*1e3:7.2f} ms/layer  {FLOPS_FWD/t/1e12:6.1f} TFLOP/s"
          f" ({FLOPS_FWD/t/1e12/197*100:4.1f}% peak)")
    t = timeit("fwdbwd", run_fb)
    eff_flops = FLOPS_FWD * 3.5  # fwd + bwd(2.5x: 5 matmuls vs 2)
    print(f"fwd+bwd: {t*1e3:7.2f} ms/layer  {eff_flops/t/1e12:6.1f} TFLOP/s"
          f" eff ({eff_flops/t/1e12/197*100:4.1f}% peak)")

    from smb_vision_tpu.ops.attention import _fwd_i8

    for tag, pv in (("int8", False), ("int8pv", True)):
        @jax.jit
        def imany(q, k, v, pv=pv):
            out = q
            for _ in range(LAYERS):
                out = _fwd_i8(out, k, v, scale=scale, block_q=4096,
                              block_k=2048, pv=pv)
            return jnp.sum(out.astype(jnp.float32))

        def run_i(i, f=imany):
            if i not in cache:
                cache[i] = mk(i)
            q, k, v = cache[i]
            return f(q, k, v)

        t = timeit(tag, run_i)
        print(f"{tag}:  {t*1e3:7.2f} ms/layer  {FLOPS_FWD/t/1e12:6.1f} "
              f"TFLOP/s-equiv ({FLOPS_FWD/t/1e12/197*100:4.1f}% bf16 peak)")


if __name__ == "__main__":
    print("device:", jax.devices()[0].device_kind)
    check_numerics()
    bench()
