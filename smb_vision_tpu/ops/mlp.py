"""Fused transformer MLP (fc1 -> GELU -> fc2) as one Pallas TPU kernel.

The reference runs its MLPs through torch nn.Linear + nn.GELU (e.g.
/root/reference/src/models/videomae/modeling_videomae.py intermediate/
output modules); under XLA the equivalent bf16 dense->gelu->dense chain
measures only 71.1 TFLOP/s on a v5e (36% of peak — the GELU+bias
epilogue drags XLA's plain-matmul 97 down, scripts/kexp/mlpk.py), while
this kernel reaches 94-95 TFLOP/s same-session (+34%,
scripts/kexp/mlpk2.py). Design:

  grid = (M // bm, F // bf)            row blocks x hidden chunks
  x_ref  (bm, K)   bf16                constant over the f axis
  w1_ref (K, bf)   bf16  |  streamed per f chunk -> ViT-L's 16 MB MLP
  w2_ref (bf, K)   bf16  |  weights never need to fit VMEM at once
  acc    (bm, K)   f32   scratch, accumulated across f chunks
  per sub-block j (bn wide) inside a chunk:
    h_j  = gelu(x @ w1[:, j] + b1[j])      f32, GELU on the VPU
    acc += h_j.bf16 @ w2[j, :]             f32 MXU accumulate
  last f chunk: out = (acc + b2).bf16

The (M, F) intermediate never touches HBM, and the bn sub-blocks give
Mosaic independent MXU/VPU chains to overlap — the same structure as the
flash kernel's u4/u8 unroll (ops/attention.py).

GELU: Mosaic has no erf lowering, so the exact-erf variant is computed
via the Abramowitz-Stegun 7.1.26 rational approximation in f32
(|abs err| <= 1.5e-7 — three orders below bf16 resolution; measured
6.7e-7 end-to-end on-chip). `jnp.sign` crashes the Mosaic compiler; the
sign is applied with `jnp.where`.

Backward: custom VJP that recomputes the XLA forward and differentiates
it (remat-style) — training forwards get the kernel speedup while
gradients stay bit-identical to the plain XLA path the CPU mesh tests.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INVSQRT2 = 0.7071067811865476
# v5e scoped-vmem limit is 16 MB; plan against 15 to leave Mosaic slack
# ops/attn_glue.py mirrors this file's planning/padding/fallback
# scaffolding with its own estimator and a tighter 14 MiB budget —
# padding-rule or OOB-sanitization fixes must land in BOTH files.
_VMEM_BUDGET = 15 * 1024 * 1024


def _gelu_as(x):
    """Exact-erf GELU via Abramowitz-Stegun 7.1.26 (|err| <= 1.5e-7)."""
    z = jnp.abs(x) * _INVSQRT2
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    e = 1.0 - poly * jnp.exp(-z * z)
    return 0.5 * x * (1.0 + jnp.where(x >= 0, e, -e))


def _gelu_tanh(x):
    return 0.5 * x * (1.0 + jnp.tanh(
        0.7978845608028654 * (x + 0.044715 * x * x * x)))


_KERNEL_ACTS = {"gelu": _gelu_as, "gelu_new": _gelu_tanh}

_INV_SQRT_2PI = 0.3989422804014327


def _gelu_as_grad(x):
    """(gelu(x), gelu'(x)) with the same A-S erf as _gelu_as:
    gelu'(x) = 0.5*(1+erf(x/sqrt2)) + x * pdf(x)."""
    z = jnp.abs(x) * _INVSQRT2
    t = 1.0 / (1.0 + 0.3275911 * z)
    poly = ((((1.061405429 * t - 1.453152027) * t + 1.421413741) * t
             - 0.284496736) * t + 0.254829592) * t
    e = 1.0 - poly * jnp.exp(-z * z)
    erf = jnp.where(x >= 0, e, -e)
    cdf = 0.5 * (1.0 + erf)
    pdf = _INV_SQRT_2PI * jnp.exp(-0.5 * x * x)
    return x * cdf, cdf + x * pdf


def _gelu_tanh_grad(x):
    """(gelu_new(x), gelu_new'(x)) for the tanh approximation."""
    c = 0.7978845608028654
    u = c * (x + 0.044715 * x * x * x)
    t = jnp.tanh(u)
    a = 0.5 * x * (1.0 + t)
    du = c * (1.0 + 3.0 * 0.044715 * x * x)
    return a, 0.5 * (1.0 + t) + 0.5 * x * (1.0 - t * t) * du


_KERNEL_ACT_GRADS = {"gelu": _gelu_as_grad, "gelu_new": _gelu_tanh_grad}


def _xla_act(name: str):
    if name == "gelu":
        return lambda x: jax.nn.gelu(x, approximate=False)
    if name == "gelu_new":
        return lambda x: jax.nn.gelu(x, approximate=True)
    raise ValueError(f"unsupported mlp act {name!r}")


def _mlp_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, acc_scr, *,
                bn: int, act: str):
    jf = pl.program_id(1)
    nf = pl.num_programs(1)
    gelu = _KERNEL_ACTS[act]

    @pl.when(jf == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    x = x_ref[...]
    acc = acc_scr[...]
    for j in range(w1_ref.shape[1] // bn):
        h = jax.lax.dot_general(
            x, w1_ref[:, j * bn:(j + 1) * bn], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = gelu(h + b1_ref[0, j * bn:(j + 1) * bn])
        acc = acc + jax.lax.dot_general(
            h.astype(jnp.bfloat16), w2_ref[j * bn:(j + 1) * bn, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_scr[...] = acc

    @pl.when(jf == nf - 1)
    def _flush():
        o_ref[...] = (acc_scr[...] + b2_ref[...]).astype(o_ref.dtype)


def _mlp_train_kernel(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref,
                      h_ref, acc_scr, *, bn: int, act: str):
    """Forward with pre-activation spill: identical math to _mlp_kernel,
    plus h = x @ w1 + b1 written (bf16) per chunk for the backward
    kernel — the recompute-free training path (round-5 VERDICT #1)."""
    jf = pl.program_id(1)
    nf = pl.num_programs(1)
    gelu = _KERNEL_ACTS[act]

    @pl.when(jf == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    x = x_ref[...]
    acc = acc_scr[...]
    for j in range(w1_ref.shape[1] // bn):
        sl = slice(j * bn, (j + 1) * bn)
        h = jax.lax.dot_general(
            x, w1_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = h + b1_ref[0, sl]
        h_ref[:, sl] = h.astype(h_ref.dtype)
        h = gelu(h)
        acc = acc + jax.lax.dot_general(
            h.astype(jnp.bfloat16), w2_ref[sl, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_scr[...] = acc

    @pl.when(jf == nf - 1)
    def _flush():
        o_ref[...] = (acc_scr[...] + b2_ref[...]).astype(o_ref.dtype)


def _mlp_bwd_kernel(h_ref, g_ref, w1_ref, w2_ref, dx_ref, dh_ref, a_ref,
                    acc_scr, *, bn: int, act: str):
    """Backward data-gradient pass over the spilled pre-activation:

      a  = act(h)                      (VPU, f32)
      da = g @ w2_chunk^T              (MXU)
      dh = da * act'(h)                (VPU)
      dx += dh @ w1_chunk^T            (MXU, f32 scratch over f chunks)

    dh and a are emitted (bf16) so the weight gradients become two plain
    bf16 matmuls OUTSIDE the kernel (dw1 = x^T dh, dw2 = a^T g) — pure
    MXU work XLA runs at matmul speed, unlike the gelu-epilogue chain
    this kernel replaces. Same sub-block unroll as the forward."""
    jf = pl.program_id(1)
    nf = pl.num_programs(1)
    act_grad = _KERNEL_ACT_GRADS[act]

    @pl.when(jf == 0)
    def _init():
        acc_scr[...] = jnp.zeros_like(acc_scr)

    g = g_ref[...]
    acc = acc_scr[...]
    for j in range(h_ref.shape[1] // bn):
        sl = slice(j * bn, (j + 1) * bn)
        h = h_ref[:, sl].astype(jnp.float32)
        a, d = act_grad(h)
        da = jax.lax.dot_general(
            g, w2_ref[sl, :], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = (da * d).astype(jnp.bfloat16)
        dh_ref[:, sl] = dh
        a_ref[:, sl] = a.astype(a_ref.dtype)
        acc = acc + jax.lax.dot_general(
            dh, w1_ref[:, sl], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_scr[...] = acc

    @pl.when(jf == nf - 1)
    def _flush():
        dx_ref[...] = acc_scr[...].astype(dx_ref.dtype)


def _mlp_block_kernel(x_ref, lnw_ref, lnb_ref, w1_ref, b1_ref, w2_ref,
                      b2_ref, o_ref, acc_scr, xn_scr, *, bn: int,
                      act: str, eps: float):
    """Whole MLP half-block: o = x + gelu(LN(x) @ w1 + b1) @ w2 + b2.
    The LayerNorm runs once per row block into a VMEM scratch (f32
    stats, matching flax.nn.LayerNorm) and the residual add rides the
    flush — the normalized activations and the MLP output never touch
    HBM."""
    jf = pl.program_id(1)
    nf = pl.num_programs(1)
    gelu = _KERNEL_ACTS[act]

    @pl.when(jf == 0)
    def _init():
        xf = x_ref[...].astype(jnp.float32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * lnw_ref[...] + lnb_ref[...]
        xn_scr[...] = xn.astype(xn_scr.dtype)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    xn = xn_scr[...]
    acc = acc_scr[...]
    for j in range(w1_ref.shape[1] // bn):
        h = jax.lax.dot_general(
            xn, w1_ref[:, j * bn:(j + 1) * bn], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        h = gelu(h + b1_ref[0, j * bn:(j + 1) * bn])
        acc = acc + jax.lax.dot_general(
            h.astype(jnp.bfloat16), w2_ref[j * bn:(j + 1) * bn, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_scr[...] = acc

    @pl.when(jf == nf - 1)
    def _flush():
        res = x_ref[...].astype(jnp.float32)
        o_ref[...] = (res + acc_scr[...] + b2_ref[...]).astype(
            o_ref.dtype)


def _swiglu_block_kernel(x_ref, lnw_ref, lnb_ref, w1a_ref, w1b_ref,
                         b1a_ref, b1b_ref, w2_ref, b2_ref, o_ref,
                         acc_scr, xn_scr, *, bn: int, eps: float):
    """SwiGLU half-block: o = x + (silu(xn@w1a+b1a) * (xn@w1b+b1b)) @ w2
    + b2 with xn = LN(x) — the DINOv2 use_swiglu_ffn path
    (reference modeling_dinov2.py:374-391), gating in f32 on the VPU.
    w1a/w1b are the two column halves of the checkpoint's weights_in."""
    jf = pl.program_id(1)
    nf = pl.num_programs(1)

    @pl.when(jf == 0)
    def _init():
        xf = x_ref[...].astype(jnp.float32)
        mu = jnp.mean(xf, axis=1, keepdims=True)
        var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
        xn = (xf - mu) * jax.lax.rsqrt(var + eps)
        xn = xn * lnw_ref[...] + lnb_ref[...]
        xn_scr[...] = xn.astype(xn_scr.dtype)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    xn = xn_scr[...]
    acc = acc_scr[...]
    for j in range(w1a_ref.shape[1] // bn):
        sl = slice(j * bn, (j + 1) * bn)
        h1 = jax.lax.dot_general(
            xn, w1a_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1a_ref[0, sl]
        h2 = jax.lax.dot_general(
            xn, w1b_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1b_ref[0, sl]
        g = h1 / (1.0 + jnp.exp(-h1)) * h2          # silu(h1) * h2
        acc = acc + jax.lax.dot_general(
            g.astype(jnp.bfloat16), w2_ref[sl, :],
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    acc_scr[...] = acc

    @pl.when(jf == nf - 1)
    def _flush():
        res = x_ref[...].astype(jnp.float32)
        o_ref[...] = (res + acc_scr[...] + b2_ref[...]).astype(
            o_ref.dtype)


def _vmem_bytes(bm: int, k: int, f: int, bf: int,
                block: bool = False, n_w: int = 2) -> int:
    """Scoped-vmem estimate for one grid step: x/out blocks are
    double-buffered across the parallel axis; when f is chunked
    (bf < f) the streamed weight chunks multi-buffer, while a
    single-chunk kernel keeps them grid-invariant (resident once).
    The fused half-block variants add a bf16 LN scratch; SwiGLU has
    three weight operands (n_w=3)."""
    x_out = 2 * (bm * k * 2) * 2           # x + out, bf16, double-buffered
    acc = bm * k * 4                        # f32 scratch
    w = n_w * k * bf * 2                    # weight chunks, bf16
    if bf < f:
        # streamed chunks cost ~3x, not 2x: Mosaic allocated 17.43M for
        # the ViT-L bf=1024 plan this formula once priced at 14.0M
        # (compile-time scoped-vmem OOM on-chip); with 3x the estimate
        # is 18M -> the planner correctly falls back to bf=512
        w *= 3
    bias = (bf + k) * 4 * (3 if bf < f else 1)
    xn = bm * k * 2 if block else 0         # LN(x) scratch
    return x_out + acc + w + bias + xn


def _plan_with(m: int, k: int, f: int, vmem_fn,
               budget: int = _VMEM_BUDGET) -> Optional[Tuple[int, int, int]]:
    """(bm, bf, bn) or None if the shape doesn't map onto a kernel whose
    per-grid-step scoped-vmem cost is `vmem_fn(bm, k, f, bf)`. The one
    tile-planning policy for every MLP-family kernel (fwd, half-block,
    swiglu, train fwd, bwd) — variants differ only in their vmem
    estimator and budget.

    bm=512 won the on-chip sweep (bm=1024 exceeds the 16 MB scoped-vmem
    limit and crashes the Mosaic compiler; ViT-L's K=1024 needs bf=1024
    chunks for the same reason); bn gives the in-chunk unroll
    (bn=768 ~ 384 > 1536 on-chip, scripts/kexp/mlpk3.py)."""
    if k % 128 != 0 or f % 128 != 0:
        return None
    for bm in (512, 256, 128):
        if m % bm != 0:
            continue
        bf = f
        while vmem_fn(bm, k, f, bf) > budget and bf % 2 == 0 and bf > 128:
            bf //= 2
        if f % bf != 0 or bf % 128 != 0 or vmem_fn(bm, k, f, bf) > budget:
            continue
        bn = next((b for b in (768, 512, 1024, 256, 128) if bf % b == 0),
                  bf)
        return bm, bf, bn
    return None


def _plan(m: int, k: int, f: int, block: bool = False,
          n_w: int = 2) -> Optional[Tuple[int, int, int]]:
    """Tile plan for the inference-forward kernel family (see
    `_plan_with` for the policy)."""
    # the 9-operand swiglu kernel OOM'd on-chip at an estimated 14.9M
    # (single-chunk 20480x768x2048) — give 3-weight kernels extra slack
    budget = _VMEM_BUDGET if n_w == 2 else 13 * 1024 * 1024
    return _plan_with(
        m, k, f,
        lambda bm, kk, ff, bf: _vmem_bytes(bm, kk, ff, bf, block, n_w),
        budget)


def _padded_plan(m: int, k: int, f: int, block: bool = False,
                 n_w: int = 2):
    """(plan, m_padded): odd row counts (e.g. DINOv2's CLS token making
    rows b*(N+1)) pad up to the next 512 multiple — the padded rows
    compute garbage that is sliced off after the kernel. Only worth it
    for real workloads (m >= 2048)."""
    plan = _plan(m, k, f, block, n_w)
    if plan is not None:
        return plan, m
    if m >= 2048:
        m_pad = -(-m // 512) * 512
        plan = _plan(m_pad, k, f, block, n_w)
        if plan is not None:
            return plan, m_pad
    return None, m


@functools.partial(jax.jit,
                   static_argnames=("act", "bm", "bf", "bn", "interpret"))
def _mlp_pallas(x2, w1, b1, w2, b2, act, bm, bf, bn, interpret=False):
    m, k = x2.shape
    f = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_mlp_kernel, bn=bn, act=act),
        grid=(m // bm, f // bf),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, jf: (i, 0)),
            pl.BlockSpec((k, bf), lambda i, jf: (0, jf)),
            pl.BlockSpec((1, bf), lambda i, jf: (0, jf)),
            pl.BlockSpec((bf, k), lambda i, jf: (jf, 0)),
            pl.BlockSpec((1, k), lambda i, jf: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, k), lambda i, jf: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), x2.dtype),
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x2, w1, b1, w2, b2)


@functools.partial(jax.jit, static_argnames=("act", "bm", "bf", "bn",
                                              "eps", "interpret"))
def _mlp_block_pallas(x2, lnw, lnb, w1, b1, w2, b2, act, bm, bf, bn, eps,
                      interpret=False):
    m, k = x2.shape
    f = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_mlp_block_kernel, bn=bn, act=act, eps=eps),
        grid=(m // bm, f // bf),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, jf: (i, 0)),
            pl.BlockSpec((1, k), lambda i, jf: (0, 0)),
            pl.BlockSpec((1, k), lambda i, jf: (0, 0)),
            pl.BlockSpec((k, bf), lambda i, jf: (0, jf)),
            pl.BlockSpec((1, bf), lambda i, jf: (0, jf)),
            pl.BlockSpec((bf, k), lambda i, jf: (jf, 0)),
            pl.BlockSpec((1, k), lambda i, jf: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, k), lambda i, jf: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), x2.dtype),
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.float32),
                        pltpu.VMEM((bm, k), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x2, lnw, lnb, w1, b1, w2, b2)


def _mlp_xla(x, w1, b1, w2, b2, act: str):
    """Bit-identical to the flax Mlp module's nn.Dense/bf16 path."""
    dt = x.dtype
    h = x @ w1.astype(dt)
    if b1 is not None:
        h = h + b1.astype(dt)
    h = _xla_act(act)(h)
    y = h @ w2.astype(dt)
    if b2 is not None:
        y = y + b2.astype(dt)
    return y


def _mlp_local(x2, w1, b1, w2, b2, act: str, interpret: bool):
    """Run the kernel on whatever (possibly per-shard) shape arrives;
    shapes the kernel can't tile fall back to XLA."""
    plan = _plan(x2.shape[0], x2.shape[1], w1.shape[1])
    if plan is None:
        return _mlp_xla(x2, w1, b1[0], w2, b2[0], act)
    return _mlp_pallas(x2, w1, b1, w2, b2, act, *plan, interpret)


def _spec_axis(arg_shape, dim):
    spec = getattr(arg_shape.sharding, "spec", None)
    return spec[dim] if spec is not None and len(spec) > dim else None


def _row_spec(arg):
    spec = getattr(arg.sharding, "spec", None)
    return spec[0] if spec is not None and len(spec) else None


def _tp_axis(w1_shape, w2_shape, row):
    """The Megatron mesh axis A when w1 is column-split (*, A) and w2
    row-split (A, *) — parallel/sharding.py's _TP_COL/_TP_ROW pattern —
    and A is not already used for the row sharding. Any OTHER axis on
    the weights (e.g. fsdp on the K dim) is gathered at use (ZeRO-3
    semantics), handled by the forced arg shardings."""
    a = _spec_axis(w1_shape, 1)
    if a is None or a != _spec_axis(w2_shape, 0):
        return None
    a_axes = a if isinstance(a, tuple) else (a,)
    row_axes = row if isinstance(row, tuple) else (row,)
    if any(ax in row_axes for ax in a_axes):
        return None
    return a


def _ln_f32(x2, lnw_row, lnb_row, eps):
    xf = x2.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    return xf, (xf - mu) * jax.lax.rsqrt(var + eps) * lnw_row + lnb_row


@functools.lru_cache(maxsize=None)
def _mlp_partitioned(act: str, interpret: bool):
    """SPMD-partitionable kernel entry. Rows shard (dp/fsdp batches run
    the kernel per shard — a bare pallas_call would be all-gathered and
    computed replicated under pjit). Megatron-TP weights (fc1
    column-split / fc2 row-split over one mesh axis) KEEP their split:
    each shard runs the kernel on its F chunk and one psum combines the
    partials — without this the fused MLP would silently undo the TP
    split and multiply MLP FLOPs by the model-axis size."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def global_fn(x2, w1, b1, w2, b2):
        return _mlp_local(x2, w1, b1, w2, b2, act, interpret)

    f = custom_partitioning(global_fn)

    def infer(mesh, arg_shapes, shape):
        return NamedSharding(mesh, P(_row_spec(arg_shapes[0]), None))

    def partition(mesh, arg_shapes, result_shape):
        row = _row_spec(arg_shapes[0])
        row_sh = NamedSharding(mesh, P(row, None))
        repl = NamedSharding(mesh, P(None, None))
        a = _tp_axis(arg_shapes[1], arg_shapes[3], row)
        if a is None:
            return (mesh, global_fn, row_sh,
                    (row_sh, repl, repl, repl, repl))

        def lower(x2, w1, b1, w2, b2):
            part = _mlp_local(x2, w1, b1, w2, jnp.zeros_like(b2), act,
                              interpret).astype(jnp.float32)
            return (jax.lax.psum(part, a) + b2[0]).astype(x2.dtype)

        return (mesh, lower, row_sh,
                (row_sh, NamedSharding(mesh, P(None, a)),
                 NamedSharding(mesh, P(None, a)),
                 NamedSharding(mesh, P(a, None)), repl))

    f.def_partition(
        partition, infer_sharding_from_operands=infer,
        sharding_rule="m k, k f, u f, f j, v j -> m j",
        reduction_factors=("f",),
        need_replication_factors=("k", "u", "j", "v"))
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _mlp_fused(x, w1, b1, w2, b2, static):
    act, interpret = static
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    m = x2.shape[0]
    _, m_pad = _padded_plan(m, x2.shape[1], w1.shape[1])
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    y = _mlp_partitioned(act, interpret)(
        x2, w1.astype(jnp.bfloat16),
        b1.astype(jnp.float32).reshape(1, -1),
        w2.astype(jnp.bfloat16),
        b2.astype(jnp.float32).reshape(1, -1))
    if m_pad != m:
        y = y[:m]
    return y.reshape(*lead, y.shape[-1]).astype(x.dtype)


def _mlp_fused_fwd(x, w1, b1, w2, b2, static):
    return _mlp_fused(x, w1, b1, w2, b2, static), (x, w1, b1, w2, b2)


def _mlp_fused_bwd(static, res, g):
    """Recompute-based backward (remat-style): jax.vjp of the XLA
    forward keeps primal and gradient definitions in one place, and XLA
    DCE already removes the recompute's unused final-matmul product
    (verified: identical HLO op counts vs a hand-truncated backward)."""
    act = static[0]
    x, w1, b1, w2, b2 = res
    _, vjp = jax.vjp(
        lambda *a: _mlp_xla(*a, act=act), x, w1, b1, w2, b2)
    return vjp(g)


_mlp_fused.defvjp(_mlp_fused_fwd, _mlp_fused_bwd)


# ---------------------------------------------------------------------------
# Training path with Pallas backward (round-5 VERDICT #1): the forward
# spills the pre-activation h once; the backward computes dx (and dh, a)
# in one kernel with NO matmul recompute, leaving dw1/dw2 as plain bf16
# matmuls. Total backward matmul FLOPs: 8*M*K*F (4 in-kernel, 4 pure
# matmul) vs the recompute VJP's 10*M*K*F on the 71-TFLOP/s XLA chain.


def _train_vmem_bytes(bm: int, k: int, f: int, bf: int) -> int:
    return _vmem_bytes(bm, k, f, bf) + 2 * bm * bf * 2   # + h out blocks


def _bwd_vmem_bytes(bm: int, k: int, f: int, bf: int) -> int:
    row_k = 2 * (bm * k * 2) * 2           # g in + dx out, double-buffered
    row_f = 3 * (bm * bf * 2) * 2          # h in + dh/a out
    acc = bm * k * 4
    w = 2 * k * bf * 2
    if bf < f:
        w *= 3                              # streamed chunks (see _vmem_bytes)
    return row_k + row_f + acc + w


def _train_plan(m, k, f):
    return _plan_with(m, k, f, _train_vmem_bytes)


def _bwd_plan(m, k, f):
    return _plan_with(m, k, f, _bwd_vmem_bytes)


def _padded_train_plan(m: int, k: int, f: int):
    """Joint plan: the padded row count must map for BOTH the train
    forward and the backward kernel (they share the spilled h layout)."""
    def ok(mm):
        return (_train_plan(mm, k, f) is not None
                and _bwd_plan(mm, k, f) is not None)
    if ok(m):
        return True, m
    if m >= 2048:
        m_pad = -(-m // 512) * 512
        if ok(m_pad):
            return True, m_pad
    return False, m


@functools.partial(jax.jit,
                   static_argnames=("act", "bm", "bf", "bn", "interpret"))
def _mlp_train_pallas(x2, w1, b1, w2, b2, act, bm, bf, bn,
                      interpret=False):
    m, k = x2.shape
    f = w1.shape[1]
    return pl.pallas_call(
        functools.partial(_mlp_train_kernel, bn=bn, act=act),
        grid=(m // bm, f // bf),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, jf: (i, 0)),
            pl.BlockSpec((k, bf), lambda i, jf: (0, jf)),
            pl.BlockSpec((1, bf), lambda i, jf: (0, jf)),
            pl.BlockSpec((bf, k), lambda i, jf: (jf, 0)),
            pl.BlockSpec((1, k), lambda i, jf: (0, 0)),
        ],
        out_specs=[pl.BlockSpec((bm, k), lambda i, jf: (i, 0)),
                   pl.BlockSpec((bm, bf), lambda i, jf: (i, jf))],
        out_shape=[jax.ShapeDtypeStruct((m, k), x2.dtype),
                   jax.ShapeDtypeStruct((m, f), jnp.bfloat16)],
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x2, w1, b1, w2, b2)


@functools.partial(jax.jit,
                   static_argnames=("act", "bm", "bf", "bn", "interpret"))
def _mlp_bwd_pallas(h, g2, w1, w2, act, bm, bf, bn, interpret=False):
    m, k = g2.shape
    f = h.shape[1]
    return pl.pallas_call(
        functools.partial(_mlp_bwd_kernel, bn=bn, act=act),
        grid=(m // bm, f // bf),
        in_specs=[
            pl.BlockSpec((bm, bf), lambda i, jf: (i, jf)),
            pl.BlockSpec((bm, k), lambda i, jf: (i, 0)),
            pl.BlockSpec((k, bf), lambda i, jf: (0, jf)),
            pl.BlockSpec((bf, k), lambda i, jf: (jf, 0)),
        ],
        out_specs=[pl.BlockSpec((bm, k), lambda i, jf: (i, 0)),
                   pl.BlockSpec((bm, bf), lambda i, jf: (i, jf)),
                   pl.BlockSpec((bm, bf), lambda i, jf: (i, jf))],
        out_shape=[jax.ShapeDtypeStruct((m, k), jnp.bfloat16),
                   jax.ShapeDtypeStruct((m, f), jnp.bfloat16),
                   jax.ShapeDtypeStruct((m, f), jnp.bfloat16)],
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(h, g2, w1, w2)


def _mlp_train_local(x2, w1, b1, w2, b2, act: str, interpret: bool):
    plan = _train_plan(x2.shape[0], x2.shape[1], w1.shape[1])
    if plan is None:
        # per-shard fallback mirroring the kernel's layout: h spilled
        # bf16, bias+act in f32, matmuls bf16
        hf = jax.lax.dot_general(
            x2, w1, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b1[0]
        y = jax.lax.dot_general(
            _KERNEL_ACTS[act](hf).astype(jnp.bfloat16), w2,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32) + b2[0]
        return y.astype(x2.dtype), hf.astype(jnp.bfloat16)
    y, h = _mlp_train_pallas(x2, w1, b1, w2, b2, act, *plan, interpret)
    return y, h


def _mlp_bwd_local(h, g2, w1, w2, act: str, interpret: bool):
    plan = _bwd_plan(g2.shape[0], g2.shape[1], h.shape[1])
    if plan is None:
        hf = h.astype(jnp.float32)
        a, d = _KERNEL_ACT_GRADS[act](hf)
        da = jax.lax.dot_general(
            g2, w2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh = (da * d).astype(jnp.bfloat16)
        dx = jax.lax.dot_general(
            dh, w1, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        return dx.astype(jnp.bfloat16), dh, a.astype(jnp.bfloat16)
    return _mlp_bwd_pallas(h, g2, w1, w2, act, *plan, interpret)


@functools.lru_cache(maxsize=None)
def _mlp_train_partitioned(act: str, interpret: bool):
    """SPMD entry for the train forward (y + spilled h). Rows shard as
    in `_mlp_partitioned`, and Megatron-TP weights (fc1 column-split /
    fc2 row-split over one mesh axis) KEEP their split: each shard
    computes its F chunk of h — so the h spill stays (m, F/tp) per
    device — and one psum combines the y partials. Without this the
    pallas_bwd train path would silently undo the TP split and multiply
    per-device MLP FLOPs and h memory by the model-axis size (the trap
    `_mlp_partitioned`'s docstring warns about)."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def global_fn(x2, w1, b1, w2, b2):
        return _mlp_train_local(x2, w1, b1, w2, b2, act, interpret)

    f = custom_partitioning(global_fn)

    def infer(mesh, arg_shapes, shape):
        row = _row_spec(arg_shapes[0])
        a = _tp_axis(arg_shapes[1], arg_shapes[3], row)
        return (NamedSharding(mesh, P(row, None)),
                NamedSharding(mesh, P(row, a)))

    def partition(mesh, arg_shapes, result_shape):
        row = _row_spec(arg_shapes[0])
        row_sh = NamedSharding(mesh, P(row, None))
        repl = NamedSharding(mesh, P(None, None))
        a = _tp_axis(arg_shapes[1], arg_shapes[3], row)
        if a is None:
            return (mesh, global_fn, (row_sh, row_sh),
                    (row_sh, repl, repl, repl, repl))

        def lower(x2, w1, b1, w2, b2):
            part, h = _mlp_train_local(x2, w1, b1, w2,
                                       jnp.zeros_like(b2), act,
                                       interpret)
            y = (jax.lax.psum(part.astype(jnp.float32), a)
                 + b2[0]).astype(x2.dtype)
            return y, h

        return (mesh, lower,
                (row_sh, NamedSharding(mesh, P(row, a))),
                (row_sh, NamedSharding(mesh, P(None, a)),
                 NamedSharding(mesh, P(None, a)),
                 NamedSharding(mesh, P(a, None)), repl))

    f.def_partition(
        partition, infer_sharding_from_operands=infer,
        # f appears in the h output, so it is a propagating factor (TP
        # split flows w1/b1/w2 <-> h), not a reduction factor
        sharding_rule="m k, k f, u f, f j, v j -> m j, m f",
        need_replication_factors=("k", "u", "j", "v"))
    return f


@functools.lru_cache(maxsize=None)
def _mlp_bwd_partitioned(act: str, interpret: bool):
    """SPMD entry for the backward kernel — the mirror of
    `_mlp_train_partitioned`'s split: h/dh/a stay F-chunked per shard
    and the dx partials psum over the model axis."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def global_fn(h, g2, w1, w2):
        return _mlp_bwd_local(h, g2, w1, w2, act, interpret)

    f = custom_partitioning(global_fn)

    def infer(mesh, arg_shapes, shape):
        row = _row_spec(arg_shapes[0])
        a = _tp_axis(arg_shapes[2], arg_shapes[3], row)
        f_sh = NamedSharding(mesh, P(row, a))
        return (NamedSharding(mesh, P(row, None)), f_sh, f_sh)

    def partition(mesh, arg_shapes, result_shape):
        row = _row_spec(arg_shapes[0])
        row_sh = NamedSharding(mesh, P(row, None))
        repl = NamedSharding(mesh, P(None, None))
        a = _tp_axis(arg_shapes[2], arg_shapes[3], row)
        if a is None:
            return (mesh, global_fn, (row_sh, row_sh, row_sh),
                    (row_sh, row_sh, repl, repl))

        def lower(h, g2, w1, w2):
            dxp, dh, aa = _mlp_bwd_local(h, g2, w1, w2, act, interpret)
            dx = jax.lax.psum(dxp.astype(jnp.float32), a).astype(
                dxp.dtype)
            return dx, dh, aa

        f_sh = NamedSharding(mesh, P(row, a))
        return (mesh, lower, (row_sh, f_sh, f_sh),
                (f_sh, row_sh, NamedSharding(mesh, P(None, a)),
                 NamedSharding(mesh, P(a, None))))

    f.def_partition(
        partition, infer_sharding_from_operands=infer,
        # need-replication factors must be listed in first-appearance
        # order (Shardy: "indices of special factors must be sorted")
        sharding_rule="m f, m j, k f, f j -> m k, m f, m f",
        need_replication_factors=("j", "k"))
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(5,))
def _mlp_fused_tb(x, w1, b1, w2, b2, static):
    # PRIMAL — runs only when the call is NOT differentiated (EMA
    # teacher under stop_gradient, eval, inference). Route to the
    # no-spill forward kernel: the h spill exists solely for the VJP's
    # fwd rule below, and XLA cannot DCE one output of a pallas
    # custom-call — the train kernel here would write a dead (m, F)
    # bf16 buffer to HBM per MLP layer (round-5 review).
    return _mlp_fused(x, w1, b1, w2, b2, static)


def _mlp_tb_fwd_impl(x, w1, b1, w2, b2, static):
    act, interpret = static
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    m = x2.shape[0]
    _, m_pad = _padded_train_plan(m, x2.shape[1], w1.shape[1])
    if m_pad != m:
        # zero padding keeps the spilled h rows finite (h = b1) so the
        # backward's 0-cotangent rows stay exactly 0 (no 0*NaN)
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    y2, h = _mlp_train_partitioned(act, interpret)(
        x2, w1.astype(jnp.bfloat16),
        b1.astype(jnp.float32).reshape(1, -1),
        w2.astype(jnp.bfloat16),
        b2.astype(jnp.float32).reshape(1, -1))
    y = y2[:m] if m_pad != m else y2
    y = y.reshape(*x.shape[:-1], y.shape[-1]).astype(x.dtype)
    return y, (x2, h)


def _mlp_fused_tb_fwd(x, w1, b1, w2, b2, static):
    y, (x2, h) = _mlp_tb_fwd_impl(x, w1, b1, w2, b2, static)
    # residuals must be arrays: dx's shape is recovered from gy + w1,
    # and cotangent dtypes (which must match the primals', like the
    # 'pallas'/'xla' impls' VJPs) from zero-size witnesses
    return y, (x2, h, w1, w2, jnp.zeros((0,), x.dtype),
               jnp.zeros((0,), b1.dtype), jnp.zeros((0,), b2.dtype))


def _mlp_fused_tb_bwd(static, res, gy):
    act, interpret = static
    x2, h, w1, w2, x_wit, b1_wit, b2_wit = res
    x_shape = (*gy.shape[:-1], w1.shape[0])
    x_dtype = x_wit.dtype
    m = 1
    for d in x_shape[:-1]:
        m *= d
    g2 = gy.reshape(m, -1).astype(jnp.bfloat16)
    m_pad = x2.shape[0]
    if m_pad != m:
        g2 = jnp.pad(g2, ((0, m_pad - m), (0, 0)))
    dx2, dh, a = _mlp_bwd_partitioned(act, interpret)(
        h, g2, w1.astype(jnp.bfloat16), w2.astype(jnp.bfloat16))
    # weight grads: pure bf16 matmuls, f32 accumulation. Padded rows of
    # dh/g2 are exactly 0 so they contribute nothing.
    dw1 = jax.lax.dot_general(x2, dh, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    dw2 = jax.lax.dot_general(a, g2, (((0,), (0,)), ((), ())),
                              preferred_element_type=jnp.float32)
    db1 = jnp.sum(dh.astype(jnp.float32), axis=0)
    db2 = jnp.sum(g2.astype(jnp.float32), axis=0)
    dx = dx2[:m] if m_pad != m else dx2
    dx = dx.reshape(x_shape).astype(x_dtype)
    return (dx, dw1.astype(w1.dtype), db1.astype(b1_wit.dtype),
            dw2.astype(w2.dtype), db2.astype(b2_wit.dtype))


_mlp_fused_tb.defvjp(_mlp_fused_tb_fwd, _mlp_fused_tb_bwd)


@functools.partial(jax.jit, static_argnames=("bm", "bf", "bn", "eps",
                                              "interpret"))
def _swiglu_block_pallas(x2, lnw, lnb, w1a, w1b, b1a, b1b, w2, b2, bm,
                         bf, bn, eps, interpret=False):
    m, k = x2.shape
    f = w1a.shape[1]
    return pl.pallas_call(
        functools.partial(_swiglu_block_kernel, bn=bn, eps=eps),
        grid=(m // bm, f // bf),
        in_specs=[
            pl.BlockSpec((bm, k), lambda i, jf: (i, 0)),
            pl.BlockSpec((1, k), lambda i, jf: (0, 0)),
            pl.BlockSpec((1, k), lambda i, jf: (0, 0)),
            pl.BlockSpec((k, bf), lambda i, jf: (0, jf)),
            pl.BlockSpec((k, bf), lambda i, jf: (0, jf)),
            pl.BlockSpec((1, bf), lambda i, jf: (0, jf)),
            pl.BlockSpec((1, bf), lambda i, jf: (0, jf)),
            pl.BlockSpec((bf, k), lambda i, jf: (jf, 0)),
            pl.BlockSpec((1, k), lambda i, jf: (0, 0)),
        ],
        out_specs=pl.BlockSpec((bm, k), lambda i, jf: (i, 0)),
        out_shape=jax.ShapeDtypeStruct((m, k), x2.dtype),
        scratch_shapes=[pltpu.VMEM((bm, k), jnp.float32),
                        pltpu.VMEM((bm, k), jnp.bfloat16)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary")),
        interpret=interpret,
    )(x2, lnw, lnb, w1a, w1b, b1a, b1b, w2, b2)


def _swiglu_block_xla(x, lnw, lnb, w_in, b_in, w_out, b_out, eps: float):
    """x + SwiGLU(LayerNorm(x)) matching models/layers.py::SwiGLU."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps) * lnw + lnb).astype(
        x.dtype)
    h = xn @ w_in.astype(x.dtype) + b_in.astype(x.dtype)
    x1, x2 = jnp.split(h, 2, axis=-1)
    g = jax.nn.silu(x1) * x2
    return x + (g @ w_out.astype(x.dtype) + b_out.astype(x.dtype))


def _swiglu_block_local(x2, lnw, lnb, w1a, w1b, b1a, b1b, w2, b2,
                        eps: float, interpret: bool):
    plan = _plan(x2.shape[0], x2.shape[1], w1a.shape[1], block=True,
                 n_w=3)
    if plan is None:
        w_in = jnp.concatenate([w1a, w1b], axis=1)
        b_in = jnp.concatenate([b1a[0], b1b[0]])
        return _swiglu_block_xla(x2, lnw[0], lnb[0], w_in, b_in, w2,
                                 b2[0], eps)
    return _swiglu_block_pallas(x2, lnw, lnb, w1a, w1b, b1a, b1b, w2,
                                b2, *plan, eps, interpret)


@functools.lru_cache(maxsize=None)
def _swiglu_block_partitioned(eps: float, interpret: bool):
    from smb_vision_tpu.ops.partition import dim0_partitioned

    return dim0_partitioned(
        lambda x2, lnw, lnb, w1a, w1b, b1a, b1b, w2, b2:
        _swiglu_block_local(x2, lnw, lnb, w1a, w1b, b1a, b1b, w2, b2,
                            eps, interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _swiglu_block_fused(x, lnw, lnb, w_in, b_in, w_out, b_out, static):
    eps, interpret = static
    lead = x.shape[:-1]
    f = w_in.shape[1] // 2
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    m = x2.shape[0]
    _, m_pad = _padded_plan(m, x2.shape[1], f, block=True, n_w=3)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    bi = b_in.astype(jnp.float32)
    y = _swiglu_block_partitioned(eps, interpret)(
        x2, lnw.astype(jnp.float32).reshape(1, -1),
        lnb.astype(jnp.float32).reshape(1, -1),
        w_in[:, :f].astype(jnp.bfloat16),
        w_in[:, f:].astype(jnp.bfloat16),
        bi[:f].reshape(1, -1), bi[f:].reshape(1, -1),
        w_out.astype(jnp.bfloat16),
        b_out.astype(jnp.float32).reshape(1, -1))
    if m_pad != m:
        y = y[:m]
    return y.reshape(*lead, y.shape[-1]).astype(x.dtype)


def _swiglu_block_fused_fwd(x, lnw, lnb, w_in, b_in, w_out, b_out,
                            static):
    return (_swiglu_block_fused(x, lnw, lnb, w_in, b_in, w_out, b_out,
                                static),
            (x, lnw, lnb, w_in, b_in, w_out, b_out))


def _swiglu_block_fused_bwd(static, res, g):
    eps, _ = static
    _, vjp = jax.vjp(lambda *a: _swiglu_block_xla(*a, eps=eps), *res)
    return vjp(g)


_swiglu_block_fused.defvjp(_swiglu_block_fused_fwd,
                           _swiglu_block_fused_bwd)


def swiglu_block_forward(x, ln_scale, ln_bias, w_in, b_in, w_out, b_out,
                         *, eps: float = 1e-6, impl: str = "auto",
                         interpret: bool = False):
    """SwiGLU half-block in one pallas kernel:
    y = x + (silu(h1) * h2) @ w_out + b_out,  [h1 | h2] = LN(x) @ w_in
    + b_in — the DINOv2 use_swiglu_ffn FFN with LN prologue and residual
    epilogue fused (LayerScale folds into w_out/b_out at the caller).

    Measured FLAT vs XLA on-chip (98.4 vs 97.3 TFLOP/s at the
    DINOv2-base shape — silu gating has no erf, so XLA's epilogue
    handles it well, unlike the gelu MLP's 71): "auto" therefore
    resolves to XLA; the kernel runs only on explicit impl="pallas".

    TP caveat: unlike the gelu MLP, this kernel REPLICATES sharded
    weights (correct, but undoes a Megatron split). A naive column
    split of weights_in (K, 2F) does not even align the silu/gate
    halves per shard, so keeping a TP split here needs an a/b-aligned
    layout — on TP meshes leave swiglu on the default XLA path, which
    GSPMD shards correctly."""
    if impl not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown mlp impl {impl!r}; "
                         "valid: 'auto', 'pallas', 'xla'")
    f = w_in.shape[1] // 2
    plan = None
    if impl != "xla" and w_in.shape[1] % 2 == 0:
        m = 1
        for d in x.shape[:-1]:
            m *= d
        plan, _ = _padded_plan(m, x.shape[-1], f, block=True, n_w=3)
    on_tpu = jax.devices()[0].platform == "tpu"
    if impl == "auto":
        impl = "xla"            # measured flat vs XLA: not auto-routed
    elif impl == "pallas" and not on_tpu:
        interpret = True        # forced-pallas off-TPU: interpret mode
    if impl == "xla":
        return _swiglu_block_xla(x, ln_scale.astype(jnp.float32),
                                 ln_bias.astype(jnp.float32), w_in,
                                 b_in, w_out, b_out, eps)
    if plan is None:
        raise ValueError(
            f"swiglu block impl='pallas' cannot map shape x={x.shape}, "
            f"w_in={w_in.shape}: rows must divide by 128 and K, F by 128")
    return _swiglu_block_fused(x, ln_scale, ln_bias, w_in, b_in, w_out,
                               b_out, (float(eps), interpret))


def _mlp_block_xla(x, lnw, lnb, w1, b1, w2, b2, act: str, eps: float):
    """x + mlp(LayerNorm(x)) with flax-matching numerics: stats and
    scale/bias in f32, matmuls in x.dtype."""
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    xn = (xf - mu) * jax.lax.rsqrt(var + eps) * lnw + lnb
    return x + _mlp_xla(xn.astype(x.dtype), w1, b1, w2, b2, act)


def _mlp_block_local(x2, lnw, lnb, w1, b1, w2, b2, act: str, eps: float,
                     interpret: bool):
    plan = _plan(x2.shape[0], x2.shape[1], w1.shape[1], block=True)
    if plan is None:
        return _mlp_block_xla(x2, lnw[0], lnb[0], w1, b1[0], w2, b2[0],
                              act, eps)
    return _mlp_block_pallas(x2, lnw, lnb, w1, b1, w2, b2, act, *plan,
                             eps, interpret)


@functools.lru_cache(maxsize=None)
def _mlp_block_partitioned(act: str, eps: float, interpret: bool):
    """As _mlp_partitioned, for the LN+MLP+residual half-block. Under
    Megatron TP the LN runs per shard in XLA (row-local), the kernel
    computes the local F chunk WITHOUT the residual/bias, and one psum
    merges the partials before x and b2 are added exactly once."""
    from jax.experimental.custom_partitioning import custom_partitioning
    from jax.sharding import NamedSharding, PartitionSpec as P

    def global_fn(x2, lnw, lnb, w1, b1, w2, b2):
        return _mlp_block_local(x2, lnw, lnb, w1, b1, w2, b2, act, eps,
                                interpret)

    f = custom_partitioning(global_fn)

    def infer(mesh, arg_shapes, shape):
        return NamedSharding(mesh, P(_row_spec(arg_shapes[0]), None))

    def partition(mesh, arg_shapes, result_shape):
        row = _row_spec(arg_shapes[0])
        row_sh = NamedSharding(mesh, P(row, None))
        repl = NamedSharding(mesh, P(None, None))
        a = _tp_axis(arg_shapes[3], arg_shapes[5], row)
        if a is None:
            return (mesh, global_fn, row_sh,
                    (row_sh, repl, repl, repl, repl, repl, repl))

        def lower(x2, lnw, lnb, w1, b1, w2, b2):
            xf, xn = _ln_f32(x2, lnw[0], lnb[0], eps)
            part = _mlp_local(xn.astype(jnp.bfloat16), w1, b1, w2,
                              jnp.zeros_like(b2), act,
                              interpret).astype(jnp.float32)
            return (jax.lax.psum(part, a) + xf + b2[0]).astype(x2.dtype)

        return (mesh, lower, row_sh,
                (row_sh, repl, repl, NamedSharding(mesh, P(None, a)),
                 NamedSharding(mesh, P(None, a)),
                 NamedSharding(mesh, P(a, None)), repl))

    f.def_partition(
        partition, infer_sharding_from_operands=infer,
        sharding_rule="m k, u k, v k, k f, w f, f j, z j -> m j",
        reduction_factors=("f",),
        need_replication_factors=("k", "u", "v", "w", "j", "z"))
    return f


@functools.partial(jax.custom_vjp, nondiff_argnums=(7,))
def _mlp_block_fused(x, lnw, lnb, w1, b1, w2, b2, static):
    act, eps, interpret = static
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    m = x2.shape[0]
    _, m_pad = _padded_plan(m, x2.shape[1], w1.shape[1], block=True)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    y = _mlp_block_partitioned(act, eps, interpret)(
        x2, lnw.astype(jnp.float32).reshape(1, -1),
        lnb.astype(jnp.float32).reshape(1, -1),
        w1.astype(jnp.bfloat16),
        b1.astype(jnp.float32).reshape(1, -1),
        w2.astype(jnp.bfloat16),
        b2.astype(jnp.float32).reshape(1, -1))
    if m_pad != m:
        y = y[:m]
    return y.reshape(*lead, y.shape[-1]).astype(x.dtype)


def _mlp_block_fused_fwd(x, lnw, lnb, w1, b1, w2, b2, static):
    return (_mlp_block_fused(x, lnw, lnb, w1, b1, w2, b2, static),
            (x, lnw, lnb, w1, b1, w2, b2))


def _mlp_block_fused_bwd(static, res, g):
    act, eps, _ = static
    _, vjp = jax.vjp(
        lambda *a: _mlp_block_xla(*a, act=act, eps=eps), *res)
    return vjp(g)


_mlp_block_fused.defvjp(_mlp_block_fused_fwd, _mlp_block_fused_bwd)


def mlp_block_forward(x, ln_scale, ln_bias, w1, b1, w2, b2, *,
                      act: str = "gelu", eps: float = 1e-6,
                      impl: str = "auto", interpret: bool = False):
    """Whole transformer MLP half-block:
    y = x + act(LayerNorm(x) @ w1 + b1) @ w2 + b2  in ONE pallas kernel
    (LN prologue + residual epilogue fused; LayerScale folds into w2/b2
    at the caller). impl semantics as `mlp_forward`."""
    if impl not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown mlp impl {impl!r}; "
                         "valid: 'auto', 'pallas', 'xla'")
    plan = None
    if impl != "xla" and act in _KERNEL_ACTS and b1 is not None \
            and b2 is not None:
        m = 1
        for d in x.shape[:-1]:
            m *= d
        plan, _ = _padded_plan(m, x.shape[-1], w1.shape[1],
                               block=True)
    on_tpu = jax.devices()[0].platform == "tpu"
    if impl == "auto":
        # the kernel computes in bf16: auto must not degrade f32 models
        impl = "pallas" if (on_tpu and plan is not None
                            and x.dtype == jnp.bfloat16) else "xla"
    elif impl == "pallas" and not on_tpu:
        interpret = True        # forced-pallas off-TPU: interpret mode
    if impl == "xla":
        return _mlp_block_xla(x, ln_scale.astype(jnp.float32),
                              ln_bias.astype(jnp.float32), w1, b1, w2,
                              b2, act, eps)
    if plan is None:
        raise ValueError(
            f"mlp block impl='pallas' cannot map shape x={x.shape}, "
            f"w1={w1.shape}: rows must divide by 128 and K, F by 128")
    return _mlp_block_fused(x, ln_scale, ln_bias, w1, b1, w2, b2,
                            (act, float(eps), interpret))


def mlp_forward(x, w1, b1, w2, b2, *, act: str = "gelu",
                impl: str = "auto", interpret: bool = False):
    """Transformer MLP y = act(x @ w1 + b1) @ w2 + b2.

    x: (..., K); w1: (K, F); b1: (F,); w2: (F, K); b2: (K,).
    impl: "auto" (pallas on TPU when the shape maps, else xla) |
          "pallas" | "pallas_bwd" | "xla". The pallas path computes
    bias+GELU in f32 (strictly tighter than the xla path's bf16
    epilogue); its backward recomputes the xla forward, so gradients
    match the plain path. "pallas_bwd" additionally runs the BACKWARD
    through a pallas kernel (forward spills the pre-activation; dx/dh
    computed recompute-free in-kernel, dw1/dw2 as pure bf16 matmuls) —
    gradients are bf16-class vs the xla path, not bit-identical
    (tests/test_mlp_bwd.py bounds them).
    """
    if impl not in ("auto", "pallas", "pallas_bwd", "xla"):
        raise ValueError(f"unknown mlp impl {impl!r}; "
                         "valid: 'auto', 'pallas', 'pallas_bwd', 'xla'")
    plan = None
    if impl != "xla" and act in _KERNEL_ACTS and b1 is not None \
            and b2 is not None:
        m = 1
        for d in x.shape[:-1]:
            m *= d
        if impl == "pallas_bwd":
            ok, _ = _padded_train_plan(m, x.shape[-1], w1.shape[1])
            plan = True if ok else None
        else:
            plan, _ = _padded_plan(m, x.shape[-1], w1.shape[1])
    on_tpu = jax.devices()[0].platform == "tpu"
    if impl == "auto":
        # the kernel computes in bf16: auto must not degrade f32 models
        impl = "pallas" if (on_tpu and plan is not None
                            and x.dtype == jnp.bfloat16) else "xla"
    elif impl in ("pallas", "pallas_bwd") and not on_tpu:
        interpret = True        # forced-pallas off-TPU: interpret mode
    if impl == "xla":
        return _mlp_xla(x, w1, b1, w2, b2, act)
    if plan is None:
        raise ValueError(
            f"mlp impl={impl!r} cannot map shape x={x.shape}, "
            f"w1={w1.shape}: rows must divide by 128 and K, F by 128")
    if impl == "pallas_bwd":
        return _mlp_fused_tb(x, w1, b1, w2, b2, (act, interpret))
    return _mlp_fused(x, w1, b1, w2, b2, (act, interpret))
