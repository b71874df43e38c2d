"""Pallas fused-MLP probe: can fc1 -> GELU -> fc2 in ONE kernel beat XLA?

Motivation (round-3 session 6): attention now runs at 96-127 TFLOP/s
through the pallas kernels, but the PROJECTION side of every block (QKV,
out, fc1/fc2 = ~19% of the embed FLOPs) rides XLA, whose bf16 matmul
chain measured only 96.6-99.1 TFLOP/s (49% of v5e peak) in the round-3
W8A8 lab (scripts/kexp/i8mm.py / BENCHMARKS.md) while the attention
kernel's q@k^T hits 155 (79%). If a pallas fused MLP reaches ~130-150,
the headline embed gains ~5-8%.

Kernel shape (ViT-Base MLP: K=768, F=3072):
  grid = (M // bm,)                     row blocks, "parallel"
  x_ref  (bm, K)  bf16                  per-step DMA
  w1_ref (K, F)   bf16  grid-invariant  VMEM-resident (4.7 MB)
  w2_ref (F, K)   bf16  grid-invariant  VMEM-resident (4.7 MB)
  b1/b2  (1, F)/(1, K) f32
  per kv-style sub-block j over F (bn wide):
    h_j = gelu(x @ w1[:, j] + b1[j])    f32 acc, GELU on the VPU
    acc += h_j.bf16 @ w2[j, :]          f32 acc
  -> independent matmul/VPU chains for Mosaic to overlap (the same
  structure that made the attention kernel's u4/u8 unroll win), and the
  (M, F) intermediate never touches HBM.

GELU: exact erf variant (the model uses approximate=False to match torch
nn.GELU). Falls back to the Abramowitz-Stegun 7.1.26 rational erf
(|err| <= 1.5e-7, far under bf16 resolution) if Mosaic won't lower erf.

Chain protocol as i8mm.py: each link consumes the previous link's output
(defeats XLA strength reduction), distinct inputs per timed call, scalar
readback, min over passes.
"""
import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LINKS = 24
M, K, F = 20480, 768, 3072
FLOPS = 4 * M * K * F * LINKS


def _gelu_erf(x):
    return 0.5 * x * (1.0 + jax.lax.erf(x * 0.7071067811865476))


def _gelu_as(x):
    # Abramowitz-Stegun 7.1.26 erf: one exp, |abs err| <= 1.5e-7
    t = 1.0 / (1.0 + 0.3275911 * jnp.abs(x) * 0.7071067811865476)
    y = 1.0 - (((((1.061405429 * t - 1.453152027) * t) + 1.421413741) * t
                - 0.284496736) * t + 0.254829592) * t * jnp.exp(
                    -0.5 * x * x)
    return 0.5 * x * (1.0 + jnp.sign(x) * y)


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                bn: int, gelu):
    x = x_ref[...]
    k = x.shape[1]
    acc = jnp.zeros((x.shape[0], k), jnp.float32)
    for j in range(w1_ref.shape[1] // bn):
        w1j = w1_ref[:, j * bn:(j + 1) * bn]
        h = jax.lax.dot_general(x, w1j, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        h = gelu(h + b1_ref[0, j * bn:(j + 1) * bn])
        w2j = w2_ref[j * bn:(j + 1) * bn, :]
        acc = acc + jax.lax.dot_general(
            h.astype(jnp.bfloat16), w2j, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    o_ref[...] = (acc + b2_ref[...]).astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "use_as", "interpret"))
def fused_mlp(x, w1, b1, w2, b2, bm=512, bn=768, use_as=False,
              interpret=False):
    m, k = x.shape
    f = w1.shape[1]
    kern = functools.partial(_mlp_kernel, bn=bn,
                             gelu=_gelu_as if use_as else _gelu_erf)
    return pl.pallas_call(
        kern,
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, f), lambda i: (0, 0)),
            pl.BlockSpec((1, f), lambda i: (0, 0)),
            pl.BlockSpec((f, k), lambda i: (0, 0)),
            pl.BlockSpec((1, k), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, k), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), x.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x, w1, b1, w2, b2)


def timeit(label, fn, args_list, n_pass=3):
    float(fn(*args_list[0]))
    times = []
    for _ in range(n_pass):
        for args in args_list[1:]:
            t0 = time.perf_counter()
            float(fn(*args))
            times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{label:34s} {t/LINKS*1e3:8.3f} ms/link  "
          f"{FLOPS/t/1e12:7.1f} TFLOP/s", flush=True)
    return t


def mk(seed, shape, dtype=jnp.bfloat16):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
            * 0.5).astype(dtype)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    xs = [mk(i, (M, K)) for i in range(4)]
    w1, w2 = mk(97, (K, F)), mk(98, (F, K))
    b1 = mk(99, (1, F), jnp.float32) * 0.1
    b2 = mk(100, (1, K), jnp.float32) * 0.1
    gelu_bf16 = lambda x: jax.nn.gelu(x, approximate=False)  # noqa: E731

    @jax.jit
    def xla_chain(x, w1, b1, w2, b2):
        y = x
        for _ in range(LINKS):
            h = gelu_bf16((y @ w1 + b1.astype(jnp.bfloat16)))
            y = ((h @ w2 + b2.astype(jnp.bfloat16)) * 0.2
                 ).astype(jnp.bfloat16)
        return jnp.sum(y.astype(jnp.float32))

    timeit("bf16 XLA mlp chain", xla_chain, [(x, w1, b1, w2, b2)
                                             for x in xs])

    for bm in (256, 512, 1024):
        for bn in (768, 1536):
            @jax.jit
            def chain(x, w1, b1, w2, b2, bm=bm, bn=bn):
                y = x
                for _ in range(LINKS):
                    y = (fused_mlp(y, w1, b1, w2, b2, bm=bm, bn=bn) * 0.2
                         ).astype(jnp.bfloat16)
                return jnp.sum(y.astype(jnp.float32))

            try:
                timeit(f"pallas fused bm={bm} bn={bn}", chain,
                       [(x, w1, b1, w2, b2) for x in xs])
            except Exception as e:  # noqa: BLE001
                print(f"pallas fused bm={bm} bn={bn} FAILED: "
                      f"{type(e).__name__}: {str(e)[:200]}", flush=True)

    # accuracy vs f32 reference (erf and A-S variants)
    xf = xs[0].astype(jnp.float32)
    ref = _gelu_erf(xf @ w1.astype(jnp.float32) + b1) @ w2.astype(
        jnp.float32) + b2
    scale = float(jnp.abs(ref).max())
    for use_as, tag in ((False, "erf"), (True, "A-S")):
        try:
            y = fused_mlp(xs[0], w1, b1, w2, b2, use_as=use_as).astype(
                jnp.float32)
            print(f"rel err pallas[{tag}] : "
                  f"{float(jnp.abs(y - ref).max()) / scale:.2e}",
                  flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"pallas[{tag}] FAILED: {type(e).__name__}: "
                  f"{str(e)[:200]}", flush=True)
    yb = (gelu_bf16(xs[0] @ w1 + b1.astype(jnp.bfloat16)) @ w2
          + b2.astype(jnp.bfloat16)).astype(jnp.float32)
    print(f"rel err bf16 XLA      : "
          f"{float(jnp.abs(yb - ref).max()) / scale:.2e}", flush=True)


if __name__ == "__main__":
    main()
