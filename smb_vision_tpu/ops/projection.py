"""Pallas bias-fused dense projection for TPU: y = x @ w + b.

Companion to ops/mlp.py for the attention-side projections (fused QKV
and the output projection), which otherwise ride XLA's dense+bias chain
(71 TFLOP/s measured at the ViT-Base shapes vs 155 for the flash
kernel's q@k^T — scripts/kexp/mlpk.py / projk.py). The reference runs
these through torch nn.Linear (modeling_videomae.py qkv/out
projections); this is the TPU-native equivalent of its fused-QKV
optimisation.

  grid = (M // bm,)          row blocks, "parallel"
  x_ref (bm, K)   bf16
  w_ref (K, N)    bf16       grid-invariant -> VMEM-resident
  b_ref (1, N)    f32
  per output sub-block j (bn wide):
    out[:, j] = (x @ w[:, j] + b[j]).bf16     f32 MXU accumulate

No cross-step accumulation (the contraction is the full K per output
block), so there is no f32 scratch; sub-blocks give Mosaic independent
chains, as in ops/attention.py and ops/mlp.py.
"""

from __future__ import annotations

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
