"""Attention half-block glue kernels: fused LN+QKV prologue and fused
out-projection+residual epilogue around the Pallas flash-attention core.

The reference leans on flash-attn 2's fused CUDA epilogues
(/root/reference/Dockerfile:40-43); here the flash kernel itself is
ops/attention.py and this module fuses the XLA glue that remained around
it — the same move that bought +1.5-4% when applied to the MLP half-block
(ops/mlp.py::mlp_block_forward, BENCHMARKS.md "fused MLP").

Two kernels, both weights-stationary (the full projection weights sit in
VMEM across the row grid; activations stream):

  qkv_ln_forward:    q, k, v = LN(x) @ W{q,k,v} + b{q,k,v}
     - the normalized activations never touch HBM (XLA materializes LN's
       output before each projection reads it back)
  attn_out_residual: o = res + (y @ Wo + bo)        (LayerScale folded
     into Wo/bo by the caller, as mlp_block_forward does with w2/b2)

Numerics: LN stats f32 (flax-matching), matmuls bf16 operands with f32
accumulation, bias adds f32 — strictly tighter than the unfused bf16
epilogues. Backward recomputes the XLA composition (remat-style custom
VJP, same policy as ops/mlp.py::_mlp_fused_bwd).

SPMD: wrapped in ops/partition.py::dim0_partitioned — rows (tokens)
shard under dp/fsdp/SP; weights are declared need-replication. Under
Megatron TP this GATHERS column-split projection weights (correct but
undoes the split) — TP meshes should keep glue_impl="xla", where GSPMD
shards the plain dots natively (same caveat as swiglu_block_forward).
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# NOTE: this module deliberately mirrors ops/mlp.py's planning/padding/
# fallback scaffolding (_padded_plan, block picking, VMEM budgeting,
# f32-stats LN, row-padding custom-VJP wrapper) rather than sharing it —
# the estimators differ per kernel (3 resident weights here vs 2-3
# streamed there) and the budgets are tuned independently (14 MiB here:
# the resident-QKV triple leaves less headroom than mlp.py's 15 MiB).
# A fix to the padding rule or the OOB-row sanitization invariant
# (CLAUDE.md) must be applied to BOTH files.
_VMEM_BUDGET = 14 * 1024 * 1024


def _pick_bn(k: int) -> int:
    # bn=768 won the mlp on-chip sweep (scripts/kexp/mlpk3.py); same MXU
    # geometry applies here (bm x K x bn dots)
    return next((b for b in (768, 512, 1024, 256, 128) if k % b == 0), k)


def _qkv_vmem(bm: int, k: int) -> int:
    act = bm * k * 2                    # one bf16 (bm, K) block
    return (2 * act                     # x, double-buffered
            + 3 * k * k * 2             # wq/wk/wv resident (grid-invariant)
            + 3 * 2 * act               # q/k/v out blocks, double-buffered
            + bm * k * 4 + act          # f32 LN temp + bf16 xn value
            + 5 * k * 4)                # lnw/lnb/biases rows


def _out_vmem(bm: int, k: int) -> int:
    act = bm * k * 2
    return (2 * act + 2 * act           # res, y double-buffered
            + k * k * 2                 # wo resident
            + 2 * act                   # out, double-buffered
            + bm * k * 4                # f32 accum temp
            + k * 4)


def _plan(m: int, k: int, vmem) -> Optional[Tuple[int, int]]:
    """(bm, bn) or None when the shape doesn't map onto the kernel."""
    if k % 128 != 0:
        return None
    for bm in (512, 256, 128):
        if m % bm == 0 and vmem(bm, k) <= _VMEM_BUDGET:
            return bm, _pick_bn(k)
    return None


def _padded_plan(m: int, k: int, vmem):
    plan = _plan(m, k, vmem)
    if plan is not None:
        return plan, m
    if m >= 2048:       # real workloads: pad odd row counts (CLS tokens)
        m_pad = -(-m // 512) * 512
        plan = _plan(m_pad, k, vmem)
        if plan is not None:
            return plan, m_pad
    return None, m


def _qkv_ln_kernel(x_ref, lnw_ref, lnb_ref, wq_ref, wk_ref, wv_ref,
                   bq_ref, bk_ref, bv_ref, q_ref, k_ref, v_ref, *,
                   bn: int, eps: float):
    xf = x_ref[...].astype(jnp.float32)
    mu = jnp.mean(xf, axis=1, keepdims=True)
    var = jnp.mean(xf * xf, axis=1, keepdims=True) - mu * mu
    xn = ((xf - mu) * jax.lax.rsqrt(var + eps)
          * lnw_ref[...] + lnb_ref[...]).astype(jnp.bfloat16)
    k = x_ref.shape[1]
    for w_ref, b_ref, o_ref in ((wq_ref, bq_ref, q_ref),
                                (wk_ref, bk_ref, k_ref),
                                (wv_ref, bv_ref, v_ref)):
        for j in range(k // bn):
            sl = slice(j * bn, (j + 1) * bn)
            acc = jax.lax.dot_general(
                xn, w_ref[:, sl], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32)
            o_ref[:, sl] = (acc + b_ref[0, sl]).astype(o_ref.dtype)


def _out_res_kernel(res_ref, y_ref, wo_ref, bo_ref, o_ref, *, bn: int):
    y = y_ref[...]
    k = y_ref.shape[1]
    for j in range(k // bn):
        sl = slice(j * bn, (j + 1) * bn)
        acc = jax.lax.dot_general(
            y, wo_ref[:, sl], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc = acc + bo_ref[0, sl] + res_ref[:, sl].astype(jnp.float32)
        o_ref[:, sl] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit,
                   static_argnames=("bm", "bn", "eps", "interpret"))
def _qkv_pallas(x2, lnw, lnb, wq, wk, wv, bq, bk, bv, bm, bn, eps,
                interpret=False):
    m, k = x2.shape
    row = pl.BlockSpec((bm, k), lambda i: (i, 0))
    whole_w = pl.BlockSpec((k, k), lambda i: (0, 0))
    whole_b = pl.BlockSpec((1, k), lambda i: (0, 0))
    out = jax.ShapeDtypeStruct((m, k), x2.dtype)
    return pl.pallas_call(
        functools.partial(_qkv_ln_kernel, bn=bn, eps=eps),
        grid=(m // bm,),
        in_specs=[row, whole_b, whole_b, whole_w, whole_w, whole_w,
                  whole_b, whole_b, whole_b],
        out_specs=(row, row, row),
        out_shape=(out, out, out),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(x2, lnw, lnb, wq, wk, wv, bq, bk, bv)


@functools.partial(jax.jit, static_argnames=("bm", "bn", "interpret"))
def _out_pallas(res2, y2, wo, bo, bm, bn, interpret=False):
    m, k = y2.shape
    row = pl.BlockSpec((bm, k), lambda i: (i, 0))
    return pl.pallas_call(
        functools.partial(_out_res_kernel, bn=bn),
        grid=(m // bm,),
        in_specs=[row, row, pl.BlockSpec((k, k), lambda i: (0, 0)),
                  pl.BlockSpec((1, k), lambda i: (0, 0))],
        out_specs=row,
        out_shape=jax.ShapeDtypeStruct((m, k), res2.dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",)),
        interpret=interpret,
    )(res2, y2, wo, bo)


def _ln_xla(x, lnw, lnb, eps):
    xf = x.astype(jnp.float32)
    mu = jnp.mean(xf, axis=-1, keepdims=True)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True) - mu * mu
    return (xf - mu) * jax.lax.rsqrt(var + eps) * lnw + lnb


def _qkv_xla(x, lnw, lnb, wq, wk, wv, bq, bk, bv, eps):
    """LN (f32 stats) + three projections, flax-Dense-matching (bf16
    matmul/bias when x is bf16)."""
    dt = x.dtype
    xn = _ln_xla(x, lnw.reshape(-1), lnb.reshape(-1), eps).astype(dt)
    return tuple(xn @ w.astype(dt) + b.reshape(-1).astype(dt)
                 for w, b in ((wq, bq), (wk, bk), (wv, bv)))


def _out_xla(res, y, wo, bo):
    dt = res.dtype
    return res + (y.astype(dt) @ wo.astype(dt)
                  + bo.reshape(-1).astype(dt))


def _qkv_local(x2, lnw, lnb, wq, wk, wv, bq, bk, bv, eps, interpret):
    plan = _plan(x2.shape[0], x2.shape[1], _qkv_vmem)
    if plan is None:
        return _qkv_xla(x2, lnw, lnb, wq, wk, wv, bq, bk, bv, eps)
    return _qkv_pallas(x2, lnw, lnb, wq, wk, wv, bq, bk, bv, *plan, eps,
                       interpret)


def _out_local(res2, y2, wo, bo, interpret):
    plan = _plan(y2.shape[0], y2.shape[1], _out_vmem)
    if plan is None:
        return _out_xla(res2, y2, wo, bo)
    return _out_pallas(res2, y2, wo, bo, *plan, interpret)


@functools.lru_cache(maxsize=None)
def _qkv_partitioned(eps: float, interpret: bool):
    from smb_vision_tpu.ops.partition import dim0_partitioned

    return dim0_partitioned(
        lambda x2, lnw, lnb, wq, wk, wv, bq, bk, bv:
        _qkv_local(x2, lnw, lnb, wq, wk, wv, bq, bk, bv, eps, interpret))


@functools.lru_cache(maxsize=None)
def _out_partitioned(interpret: bool):
    from smb_vision_tpu.ops.partition import dim0_partitioned

    return dim0_partitioned(
        lambda res2, y2, wo, bo: _out_local(res2, y2, wo, bo, interpret),
        sharded_args=(0, 1))


@functools.partial(jax.custom_vjp, nondiff_argnums=(9,))
def _qkv_fused(x, lnw, lnb, wq, wk, wv, bq, bk, bv, static):
    eps, interpret = static
    lead = x.shape[:-1]
    x2 = x.reshape(-1, x.shape[-1]).astype(jnp.bfloat16)
    m = x2.shape[0]
    _, m_pad = _padded_plan(m, x2.shape[1], _qkv_vmem)
    if m_pad != m:
        x2 = jnp.pad(x2, ((0, m_pad - m), (0, 0)))
    f32row = lambda a: a.astype(jnp.float32).reshape(1, -1)  # noqa: E731
    q, k, v = _qkv_partitioned(eps, interpret)(
        x2, f32row(lnw), f32row(lnb),
        wq.astype(jnp.bfloat16), wk.astype(jnp.bfloat16),
        wv.astype(jnp.bfloat16), f32row(bq), f32row(bk), f32row(bv))
    if m_pad != m:
        q, k, v = q[:m], k[:m], v[:m]
    shp = (*lead, q.shape[-1])
    return (q.reshape(shp).astype(x.dtype), k.reshape(shp).astype(x.dtype),
            v.reshape(shp).astype(x.dtype))


def _qkv_fused_fwd(x, lnw, lnb, wq, wk, wv, bq, bk, bv, static):
    return (_qkv_fused(x, lnw, lnb, wq, wk, wv, bq, bk, bv, static),
            (x, lnw, lnb, wq, wk, wv, bq, bk, bv))


def _qkv_fused_bwd(static, res, g):
    eps = static[0]
    x = res[0]
    lead = x.shape[:-1]

    def ref(x, lnw, lnb, wq, wk, wv, bq, bk, bv):
        x2 = x.reshape(-1, x.shape[-1])
        outs = _qkv_xla(x2, lnw, lnb, wq, wk, wv, bq, bk, bv, eps)
        shp = (*lead, outs[0].shape[-1])
        return tuple(o.reshape(shp) for o in outs)

    _, vjp = jax.vjp(ref, *res)
    return vjp(g)


_qkv_fused.defvjp(_qkv_fused_fwd, _qkv_fused_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _out_fused(res, y, wo, bo, static):
    interpret, = static
    lead = res.shape[:-1]
    res2 = res.reshape(-1, res.shape[-1]).astype(jnp.bfloat16)
    y2 = y.reshape(-1, y.shape[-1]).astype(jnp.bfloat16)
    m = res2.shape[0]
    _, m_pad = _padded_plan(m, y2.shape[1], _out_vmem)
    if m_pad != m:
        res2 = jnp.pad(res2, ((0, m_pad - m), (0, 0)))
        y2 = jnp.pad(y2, ((0, m_pad - m), (0, 0)))
    o = _out_partitioned(interpret)(
        res2, y2, wo.astype(jnp.bfloat16),
        bo.astype(jnp.float32).reshape(1, -1))
    if m_pad != m:
        o = o[:m]
    return o.reshape(*lead, o.shape[-1]).astype(res.dtype)


def _out_fused_fwd(res, y, wo, bo, static):
    return _out_fused(res, y, wo, bo, static), (res, y, wo, bo)


def _out_fused_bwd(static, saved, g):
    _, vjp = jax.vjp(_out_xla, *saved)
    return vjp(g)


_out_fused.defvjp(_out_fused_fwd, _out_fused_bwd)


def _route(impl: str, x, k: int, vmem) -> str:
    """Resolve 'auto' exactly like mlp_block_forward: pallas iff on TPU,
    bf16 compute, and the shape maps; forced-pallas off-TPU runs in
    interpret mode (handled by the caller)."""
    if impl not in ("auto", "pallas", "xla"):
        raise ValueError(f"unknown glue impl {impl!r}; "
                         "valid: 'auto', 'pallas', 'xla'")
    m = 1
    for d in x.shape[:-1]:
        m *= d
    plan, _ = _padded_plan(m, k, vmem)
    on_tpu = jax.devices()[0].platform == "tpu"
    if impl == "auto":
        return "pallas" if (on_tpu and plan is not None
                            and x.dtype == jnp.bfloat16) else "xla"
    if impl == "pallas" and plan is None:
        # name the actual blocker: _plan also returns None when the
        # resident weights exceed the VMEM budget even though the shape
        # divides cleanly (e.g. hidden sizes past ~1.2k)
        if m % 128 or k % 128:
            detail = ("rows (or a 512-padded row count >= 2048) must "
                      "divide by 128 and the feature dim by 128")
        else:
            detail = ("the weights resident in VMEM exceed the "
                      f"{vmem // (1 << 20)} MiB scoped budget at feature "
                      f"dim {k} for every row-block size")
        raise ValueError(
            f"glue impl='pallas' cannot map shape x={x.shape}: {detail}")
    return impl


def qkv_ln_forward(x, ln_scale, ln_bias, wq, bq, wk, bk, wv, bv, *,
                   eps: float = 1e-6, impl: str = "auto",
                   interpret: bool = False):
    """q, k, v = LayerNorm(x) @ W + b in ONE weights-stationary pallas
    kernel (LN f32 stats in VMEM; the normalized activations never hit
    HBM). Missing biases (VideoMAE's k, bias_mode='qv') pass as None and
    cost a zeros row. Returns three arrays shaped like x."""
    k_dim = x.shape[-1]
    impl = _route(impl, x, k_dim, _qkv_vmem)
    zeros = jnp.zeros((k_dim,), jnp.float32)
    bq = zeros if bq is None else bq
    bk = zeros if bk is None else bk
    bv = zeros if bv is None else bv
    if impl == "xla":
        lead = x.shape[:-1]
        outs = _qkv_xla(x.reshape(-1, k_dim), ln_scale.reshape(1, -1),
                        ln_bias.reshape(1, -1), wq, wk, wv,
                        bq.reshape(1, -1), bk.reshape(1, -1),
                        bv.reshape(1, -1), eps)
        return tuple(o.reshape(*lead, k_dim) for o in outs)
    if jax.devices()[0].platform != "tpu":
        interpret = True
    return _qkv_fused(x, ln_scale, ln_bias, wq, wk, wv, bq, bk, bv,
                      (float(eps), interpret))


def attn_out_residual(res, y, wo, bo, *, layerscale=None,
                      impl: str = "auto", interpret: bool = False):
    """res + (y @ wo + bo) [* layerscale, folded into wo/bo] in one
    pallas kernel — the attention half-block's residual epilogue."""
    if layerscale is not None:
        wo = wo * layerscale[None, :].astype(wo.dtype)
        bo = bo * layerscale.astype(bo.dtype)
    impl = _route(impl, y, y.shape[-1], _out_vmem)
    if impl == "xla":
        lead = res.shape[:-1]
        k = res.shape[-1]
        return _out_xla(res.reshape(-1, k), y.reshape(-1, k), wo,
                        bo.reshape(1, -1)).reshape(*lead, k)
    if jax.devices()[0].platform != "tpu":
        interpret = True
    return _out_fused(res, y, wo, bo, (interpret,))
