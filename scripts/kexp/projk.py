"""Projection (dense+bias) pallas vs XLA on-chip at the attention
shapes: fused-QKV (768 -> 2304) and out-proj (768 -> 768). Chain
protocol (each link consumes the previous output; distinct inputs;
scalar readback; min over passes).

NEGATIVE RESULT (round-3 session 6): the pallas dense+bias kernel is
flat vs XLA at both shapes (83.0 vs 84.7, 39.6 vs 40.6 TFLOP/s), and
the chain-level 2x for fused QKV (wide 84.7 vs narrow 40.6) did NOT
survive in-model composition: model_bench.py qkv measured fused_qkv
3-5% SLOWER (d64+int8 6.36 vs 6.69 vol/s) — XLA's dot-merger already
coalesces the three same-input narrow dots inside a block, and the
manual concat+slice adds copies. fused_qkv stays default-off.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

# --- the probed kernel (kept here as a NEGATIVE result: isolated-chain
# wins below did not survive in-model composition — XLA's dot-merger
# already coalesces same-input narrow dots; see BENCHMARKS.md) ---

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_VMEM_BUDGET = 14 * 1024 * 1024


def _proj_kernel(x_ref, w_ref, b_ref, o_ref, *, bn: int):
    x = x_ref[...]
    for j in range(w_ref.shape[1] // bn):
        acc = jax.lax.dot_general(
            x, w_ref[:, j * bn:(j + 1) * bn], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        o_ref[:, j * bn:(j + 1) * bn] = (
            acc + b_ref[0, j * bn:(j + 1) * bn]).astype(o_ref.dtype)


def _vmem_bytes(bm: int, k: int, n: int) -> int:
    x_out = 2 * bm * (k + n) * 2           # x + out bf16, double-buffered
    return x_out + 2 * k * n + n * 4        # + resident w (bf16) + bias


def _plan(m: int, k: int, n: int) -> Optional[Tuple[int, int]]:
    """(bm, bn) or None if the shape doesn't map onto the kernel."""
    if k % 128 != 0 or n % 128 != 0:
        return None
    for bm in (512, 256, 128):
        if m % bm == 0 and _vmem_bytes(bm, k, n) <= _VMEM_BUDGET:
            bn = next((b for b in (768, 512, 1024, 256, 128)
                       if n % b == 0), n)
            return bm, bn
    return None


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def _proj_pallas(x2, w, b, bm, bn, interpret=False):
    m, k = x2.shape
    n = w.shape[1]
    return pl.pallas_call(
        functools.partial(_proj_kernel, bn=bn),
        grid=(m // bm,),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i: (i, 0)),
            pl.BlockSpec((k, n), lambda i: (0, 0)),
            pl.BlockSpec((1, n), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, n), lambda i: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, n), x2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, w, b)


def _proj_xla(x, w, b):
    dt = x.dtype
    y = x @ w.astype(dt)
    if b is not None:
        y = y + b.astype(dt)
    return y


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _proj_fused(x, w, b, static):
    bm, bn, interpret = static
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    y = _proj_pallas(x2, w.astype(jnp.bfloat16),
                     b.astype(jnp.float32).reshape(1, -1), bm, bn,
                     interpret)
    return y.reshape(*lead, y.shape[-1]).astype(x.dtype)


def _proj_fused_fwd(x, w, b, static):
    return _proj_fused(x, w, b, static), (x, w, b)


def _proj_fused_bwd(static, res, g):
    x, w, b = res
    _, vjp = jax.vjp(_proj_xla, x, w, b)
    return vjp(g)


_proj_fused.defvjp(_proj_fused_fwd, _proj_fused_bwd)


def dense_forward(x, w, b=None, *, impl: str = "auto",
                  interpret: bool = False):
    """y = x @ w (+ b). impl: "auto" (pallas on TPU when the shape maps,
    else xla) | "pallas" | "xla". The pallas path adds the bias in f32
    before the bf16 store; backward recomputes via XLA (bit-identical
    grads to the plain dense path)."""
    if impl not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown dense impl {impl!r}; "
                         "valid: 'auto', 'pallas', 'xla'")
    plan = None
    if impl != "xla" and b is not None:
        m = 1
        for d in x.shape[:-1]:
            m *= d
        plan = _plan(m, x.shape[-1], w.shape[1])
    if impl == "auto":
        on_tpu = jax.devices()[0].platform == "tpu"
        impl = "pallas" if (on_tpu and plan is not None) else "xla"
    if impl == "xla":
        return _proj_xla(x, w, b)
    if plan is None:
        raise ValueError(
            f"dense impl='pallas' cannot map shape x={x.shape}, "
            f"w={w.shape} (rows/K/N must tile by 128; bias required)")
    return _proj_fused(x, w, b, (*plan, interpret))


# --- probe harness ---

M = 20480


def mk(seed, shape, dtype=jnp.bfloat16, s=0.5):
    return (jax.random.normal(jax.random.PRNGKey(seed), shape, jnp.float32)
            * s).astype(dtype)


def timeit(label, fn, args_list, flops, links, n_pass=3):
    float(fn(*args_list[0]))
    times = []
    for _ in range(n_pass):
        for args in args_list[1:]:
            t0 = time.perf_counter()
            float(fn(*args))
            times.append(time.perf_counter() - t0)
    t = min(times)
    print(f"{label:34s} {t/links*1e3:8.3f} ms/link  "
          f"{flops/t/1e12:7.1f} TFLOP/s", flush=True)


def bench_pair(K, N, links=48):
    """Alternate K->N and N->K links (the qkv/out-proj pair when
    K=768, N=2304 covers both directions of the attention block)."""
    xs = [mk(i, (M, K)) for i in range(4)]
    wa, ba = mk(97, (K, N)), mk(99, (N,), jnp.float32) * 0.1
    wb, bb = mk(98, (N, K)), mk(100, (K,), jnp.float32) * 0.1
    flops = 2 * M * K * N * 2 * (links // 2)
    print(f"pair K={K} N={N} plan={_plan(M, K, N)}/{_plan(M, N, K)}",
          flush=True)

    def chain(impl):
        @jax.jit
        def f(x, wa, ba, wb, bb):
            y = x
            for _ in range(links // 2):
                y = dense_forward(y, wa, ba, impl=impl)
                y = (dense_forward(y, wb, bb, impl=impl) * 0.2
                     ).astype(jnp.bfloat16)
            return jnp.sum(y.astype(jnp.float32))
        return f

    args = [(x, wa, ba, wb, bb) for x in xs]
    timeit(f"xla    K={K} N={N}", chain("xla"), args, flops, links)
    timeit(f"pallas K={K} N={N}", chain("pallas"), args, flops, links)

    ref = dense_forward(xs[0].astype(jnp.float32), wa.astype(jnp.float32),
                        ba, impl="xla")
    y = dense_forward(xs[0], wa, ba, impl="pallas").astype(jnp.float32)
    print("  compiled rel err vs f32:",
          f"{float(jnp.abs(y - ref).max() / jnp.abs(ref).max()):.2e}",
          flush=True)


def main():
    print("device:", jax.devices()[0].device_kind, flush=True)
    bench_pair(768, 2304)    # fused QKV + consume-back
    bench_pair(768, 768)     # out-proj shape both ways


if __name__ == "__main__":
    main()
