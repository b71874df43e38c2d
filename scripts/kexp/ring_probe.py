"""Ring-attention memory probe ON the chip (round-3 VERDICT item 2).

Emulates ONE device's share of a 2-device ring at the full-res config
(20480 tokens -> q shard 10240, two kv blocks of 10240) on the single
v5e and compares the two per-block body implementations:

- kernel body: attention_with_lse per block + exp2 lse merge (the shipped
  ring_attention body)
- einsum body: the round-2 implementation's per-block XLA einsum, which
  materialises the f32 (B, H, Nloc, Nloc) score tensor (~4.8 GB here) —
  expected to OOM or blow the HLO temp budget at this shape

Reports compiled memory_analysis() temp sizes where available, wall time
with per-call scalar readback, and kernel-vs-einsum numerics at a small
control shape.
"""

import time

import jax
import jax.numpy as jnp

from smb_vision_tpu.ops.attention import attention_with_lse

B, H, D = 1, 12, 64
N_LOCAL = 10240   # 20480 / model=2


def merge(a, b):
    out_a, lse_a = a
    out_b, lse_b = b
    m = jnp.maximum(lse_a, lse_b)
    wa = jnp.exp2(lse_a - m)
    wb = jnp.exp2(lse_b - m)
    denom = wa + wb
    bw = lambda w: jnp.swapaxes((w / denom)[..., None], 1, 2)  # noqa: E731
    return out_a * bw(wa) + out_b * bw(wb), m + jnp.log2(denom)


def ring_body_kernel(q, k1, v1, k2, v2):
    def block(k, v):
        out, lse = attention_with_lse(q, k, v, impl="pallas")
        return out.astype(jnp.float32), lse
    out, _ = merge(block(k1, v1), block(k2, v2))
    return jnp.sum(out)


def ring_body_einsum(q, k1, v1, k2, v2):
    """The round-2 ring body: per-block einsum + normalised softmax."""
    import math
    scale = 1.0 / math.sqrt(D)

    def block(k, v):
        s = jnp.einsum("bqhd,bkhd->bhqk", q, k,
                       preferred_element_type=jnp.float32) * scale
        m = jnp.max(s, axis=-1, keepdims=True)
        p = jnp.exp(s - m)
        l = jnp.sum(p, axis=-1, keepdims=True)
        out = jnp.einsum("bhqk,bkhd->bqhd", (p / l).astype(v.dtype), v)
        lse = (m + jnp.log(l))[..., 0] * 1.4426950408889634
        return out.astype(jnp.float32), lse

    out, _ = merge(block(k1, v1), block(k2, v2))
    return jnp.sum(out)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 5)
    mk = lambda k: jax.random.normal(  # noqa: E731
        k, (B, N_LOCAL, H, D), jnp.bfloat16) * 0.3
    q, k1, v1, k2, v2 = (mk(k) for k in ks)

    for name, body in (("kernel", ring_body_kernel),
                       ("einsum", ring_body_einsum)):
        fn = jax.jit(body)
        try:
            lowered = fn.lower(q, k1, v1, k2, v2)
            compiled = lowered.compile()
            try:
                ma = compiled.memory_analysis()
                print(f"{name}: temp {ma.temp_size_in_bytes / 2**30:.2f} GiB"
                      f", args {ma.argument_size_in_bytes / 2**20:.0f} MiB",
                      flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"{name}: memory_analysis unavailable: {e}",
                      flush=True)
            t0 = time.perf_counter()
            val = float(compiled(q, k1, v1, k2, v2))
            t1 = time.perf_counter()
            # second call with distinct input (relay memoizes)
            q2 = jax.random.normal(jax.random.PRNGKey(9), q.shape,
                                   jnp.bfloat16) * 0.3
            t2 = time.perf_counter()
            val2 = float(compiled(q2, k1, v1, k2, v2))
            t3 = time.perf_counter()
            print(f"{name}: OK val={val:.3f}/{val2:.3f} "
                  f"first {t1 - t0:.2f}s, second {t3 - t2:.2f}s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"{name}: FAILED: {type(e).__name__}: "
                  f"{str(e)[:300]}", flush=True)


if __name__ == "__main__":
    main()
