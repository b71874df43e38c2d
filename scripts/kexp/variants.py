"""Flash-attention forward-kernel variants for the d64 perf campaign.

Baseline (round 1, ops/attention.py): grid (bh, nq, nk), per-step
  s = q @ k^T (K=64: ~50% MXU fill), online softmax (VPU),
  acc += p @ v (output width 64: ~50% MXU tile width).

Variants here:
  v_t    — transposed accumulation: sT = k @ q^T per kv block, softmax along
           the sublane axis, accumulate oT = v^T @ pT (contraction over the
           kv block = full 128-multiple K, output width bq = full lanes).
           Fixes the pv half-width-tile penalty. One (d, bq) transpose per
           q block at finish.
  v_u2   — baseline with 2 kv blocks unrolled per grid step so the compiler
           can overlap block j's softmax (VPU) with block j+1's s matmul
           (MXU).
  v_exp2 — baseline with scale folded into log2(e) and jnp.exp2 for the
           softmax exponent.
  combinations of the above.

All variants share the baseline's numerics contract (bf16 operands, f32
accumulation) and are checked against xla attention in interpret mode by
check_cpu.py before any TPU timing.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30
LOG2E = 1.4426950408889634


def _cdiv(a, b):
    return -(-a // b)


# ---------------------------------------------------------------------------
# v_t: transposed accumulation
# ---------------------------------------------------------------------------
# Layout per grid step (b, iq, ik):
#   q_ref (1, bq, d), k_ref (1, bk, d), v_ref (1, bk, d)
#   sT = k @ q^T                (bk, bq)  K=d (50% fill), width bq (full)
#   column softmax state: m, l (1, bq) rows... kept as (8, bq) f32 scratch
#   accT (d, bq) f32 scratch; accT += v^T @ pT  -> contraction bk (full K),
#   output width bq (full lanes)
#   finish: o = (accT / l)^T

def _fwd_kernel_t(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                  *, scale: float, block_k: int, kv_len: int,
                  use_exp2: bool):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]                                        # (bq, d) bf16
    k = k_ref[0]                                        # (bk, d)
    v = v_ref[0]
    # sT = k @ q^T: contraction over d
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    if use_exp2:
        st = st * (scale * LOG2E)
    else:
        st = st * scale
    if kv_len % block_k != 0:
        kv_ids = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, st.shape, dimension=0)
        st = jnp.where(kv_ids < kv_len, st, NEG_INF)

    m_prev = m_scr[:1]                                  # (1, bq)
    l_prev = l_scr[:1]
    m_cur = jnp.max(st, axis=0, keepdims=True)          # (1, bq)
    m_new = jnp.maximum(m_prev, m_cur)
    expf = jnp.exp2 if use_exp2 else jnp.exp
    pt = expf(st - m_new)                               # (bk, bq) f32
    alpha = expf(m_prev - m_new)                        # (1, bq)
    l_new = alpha * l_prev + jnp.sum(pt, axis=0, keepdims=True)

    # accT = accT * alpha + v^T @ pT  (contract over bk)
    acc_scr[:] = acc_scr[:] * alpha + jax.lax.dot_general(
        v, pt.astype(v.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)             # (d, bq)

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).T.astype(o_ref.dtype)


def fwd_t(q, k, v, *, scale, block_q=1024, block_k=1024, use_exp2=True,
          interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    if kv % block_k:
        raise ValueError("v_t needs kv % block_k == 0 for now")
    grid = (bh, _cdiv(nq, block_q), _cdiv(kv, block_k))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_t, scale=scale, block_k=block_k,
                          kv_len=kv, use_exp2=use_exp2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q, k, v)
    return out


# ---------------------------------------------------------------------------
# v_u2: 2 kv blocks per grid step (software pipelining for MXU/VPU overlap)
# ---------------------------------------------------------------------------

def _fwd_kernel_u2(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                   *, scale: float, use_exp2: bool):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]                                        # (2*bk2, d)
    v = v_ref[0]
    half = k.shape[0] // 2
    expf = jnp.exp2 if use_exp2 else jnp.exp
    eff_scale = scale * (LOG2E if use_exp2 else 1.0)

    # two independent score matmuls -> the scheduler can overlap the
    # softmax of the first with the matmul of the second
    s1 = jax.lax.dot_general(q, k[:half], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * eff_scale
    s2 = jax.lax.dot_general(q, k[half:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32) * eff_scale

    m_prev = m_scr[:, :1]
    l_prev = l_scr[:, :1]
    m12 = jnp.maximum(jnp.max(s1, axis=-1, keepdims=True),
                      jnp.max(s2, axis=-1, keepdims=True))
    m_new = jnp.maximum(m_prev, m12)
    p1 = expf(s1 - m_new)
    p2 = expf(s2 - m_new)
    alpha = expf(m_prev - m_new)
    l_new = (alpha * l_prev + jnp.sum(p1, axis=-1, keepdims=True)
             + jnp.sum(p2, axis=-1, keepdims=True))

    acc = acc_scr[:] * alpha
    acc = acc + jax.lax.dot_general(
        p1.astype(v.dtype), v[:half], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(
        p2.astype(v.dtype), v[half:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def fwd_u2(q, k, v, *, scale, block_q=1024, block_k=1024, use_exp2=True,
           interpret=False):
    """block_k here is the TOTAL kv block per step (split in two halves)."""
    bh, nq, d = q.shape
    kv = k.shape[1]
    if kv % block_k:
        raise ValueError("v_u2 needs kv % block_k == 0")
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_u2, scale=scale, use_exp2=use_exp2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q, k, v)
    return out


# ---------------------------------------------------------------------------
# v_tu2: transposed accumulation + 2 kv blocks per step
# ---------------------------------------------------------------------------

def _fwd_kernel_tu2(q_ref, k_ref, v_ref, o_ref, m_scr, l_scr, acc_scr,
                    *, scale: float, use_exp2: bool):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        m_scr[:] = jnp.full_like(m_scr, NEG_INF)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    half = k.shape[0] // 2
    expf = jnp.exp2 if use_exp2 else jnp.exp
    eff_scale = scale * (LOG2E if use_exp2 else 1.0)

    st1 = jax.lax.dot_general(k[:half], q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) * eff_scale
    st2 = jax.lax.dot_general(k[half:], q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32) * eff_scale

    m_prev = m_scr[:1]
    l_prev = l_scr[:1]
    m12 = jnp.maximum(jnp.max(st1, axis=0, keepdims=True),
                      jnp.max(st2, axis=0, keepdims=True))
    m_new = jnp.maximum(m_prev, m12)
    pt1 = expf(st1 - m_new)
    pt2 = expf(st2 - m_new)
    alpha = expf(m_prev - m_new)
    l_new = (alpha * l_prev + jnp.sum(pt1, axis=0, keepdims=True)
             + jnp.sum(pt2, axis=0, keepdims=True))

    acc = acc_scr[:] * alpha
    acc = acc + jax.lax.dot_general(
        v[:half], pt1.astype(v.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc = acc + jax.lax.dot_general(
        v[half:], pt2.astype(v.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    acc_scr[:] = acc

    m_scr[:] = jnp.broadcast_to(m_new, m_scr.shape)
    l_scr[:] = jnp.broadcast_to(l_new, l_scr.shape)

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).T.astype(o_ref.dtype)


def fwd_tu2(q, k, v, *, scale, block_q=1024, block_k=1024, use_exp2=True,
            interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    if kv % block_k:
        raise ValueError("v_tu2 needs kv % block_k == 0")
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_tu2, scale=scale, use_exp2=use_exp2),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q, k, v)
    return out


# baseline from the package
def fwd_base(q, k, v, *, scale, block_q=1024, block_k=1024,
             interpret=False):
    from smb_vision_tpu.ops.attention import _fwd

    out, _ = _fwd(q, k, v, scale=scale, block_q=block_q, block_k=block_k,
                  interpret=interpret)
    return out


VARIANTS = {
    "base": fwd_base,
    "t": fwd_t,
    "u2": fwd_u2,
    "tu2": fwd_tu2,
}


# ---------------------------------------------------------------------------
# v_nm: no-running-max exact softmax.
#   softmax is shift-invariant: fix the shift C per q block from the FIRST
#   kv block's max; p = exp2(s' - C) with s' = q'@k^T where q' is pre-scaled
#   by scale*log2(e) outside the kernel. acc += p@v with NO alpha rescale,
#   l += rowsum(p). o = acc / l is exact. Numerical risk is only overflow
#   when a later block's score exceeds C + 126 (in log2 units) — for
#   LayerNormed ViT activations scores are O(10), so the margin is ~100x.
#   VPU passes per step drop from ~6 (scale, max, sub+exp, sum, cast,
#   alpha-rescale) to ~3 (exp+cast, sum).
# ---------------------------------------------------------------------------

def _fwd_kernel_nm(q_ref, k_ref, v_ref, o_ref, c_scr, l_scr, acc_scr,
                   *, block_k: int, kv_len: int):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    q = q_ref[0]                                       # (bq, d) bf16, scaled
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    if kv_len % block_k != 0:
        kv_ids = ik * block_k + jax.lax.broadcasted_iota(
            jnp.int32, s.shape, dimension=1)
        s = jnp.where(kv_ids < kv_len, s, NEG_INF)

    @pl.when(ik == 0)
    def _init():
        c_scr[:] = jnp.broadcast_to(
            jnp.max(s, axis=-1, keepdims=True), c_scr.shape)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    c = c_scr[:, :1]
    p = jnp.exp2(s - c)                                # (bq, bk) f32
    l_scr[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] += jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def fwd_nm(q, k, v, *, scale, block_q=1024, block_k=1024, interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    grid = (bh, _cdiv(nq, block_q), _cdiv(kv, block_k))
    out = pl.pallas_call(
        functools.partial(_fwd_kernel_nm, block_k=block_k, kv_len=kv),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q, k, v)
    return out


def _fwd_kernel_nmu2(q_ref, k_ref, v_ref, o_ref, c_scr, l_scr, acc_scr):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    half = k.shape[0] // 2
    s1 = jax.lax.dot_general(q, k[:half], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    s2 = jax.lax.dot_general(q, k[half:], (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)

    @pl.when(ik == 0)
    def _init():
        m12 = jnp.maximum(jnp.max(s1, axis=-1, keepdims=True),
                          jnp.max(s2, axis=-1, keepdims=True))
        c_scr[:] = jnp.broadcast_to(m12, c_scr.shape)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    c = c_scr[:, :1]
    p1 = jnp.exp2(s1 - c)
    p2 = jnp.exp2(s2 - c)
    l_scr[:, :1] += (jnp.sum(p1, axis=-1, keepdims=True)
                     + jnp.sum(p2, axis=-1, keepdims=True))
    acc = acc_scr[:]
    acc += jax.lax.dot_general(p1.astype(v.dtype), v[:half],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(p2.astype(v.dtype), v[half:],
                               (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc_scr[:] = acc

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def fwd_nmu2(q, k, v, *, scale, block_q=1024, block_k=1024,
             interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    if kv % block_k:
        raise ValueError("v_nmu2 needs kv % block_k == 0")
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    out = pl.pallas_call(
        _fwd_kernel_nmu2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q, k, v)
    return out


VARIANTS["nm"] = fwd_nm
VARIANTS["nmu2"] = fwd_nmu2


# ---------------------------------------------------------------------------
# v_nmbf: nm + bf16 score output from the MXU (halves s VMEM traffic).
# exp2 still computed in f32 upcast from bf16 scores — precision of the
# softmax weights drops to bf16 score resolution (|s|<=~30 -> exponent
# error <= 0.12 log2 units worst-case). Inference-oriented fast path.
# ---------------------------------------------------------------------------

def _fwd_kernel_nmbf(q_ref, k_ref, v_ref, o_ref, c_scr, l_scr, acc_scr):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.bfloat16)

    @pl.when(ik == 0)
    def _init():
        c_scr[:] = jnp.broadcast_to(
            jnp.max(s.astype(jnp.float32), axis=-1, keepdims=True),
            c_scr.shape)
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    c = c_scr[:, :1]
    p = jnp.exp2(s.astype(jnp.float32) - c)
    l_scr[:, :1] += jnp.sum(p, axis=-1, keepdims=True)
    acc_scr[:] += jax.lax.dot_general(
        p.astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finish():
        l = l_scr[:, :1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:] / l).astype(o_ref.dtype)


def fwd_nmbf(q, k, v, *, scale, block_q=1024, block_k=1024,
             interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    if kv % block_k:
        raise ValueError("nmbf needs kv % block_k == 0")
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    out = pl.pallas_call(
        _fwd_kernel_nmbf,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q, k, v)
    return out


# ---------------------------------------------------------------------------
# probes: pure matmul floors at the attention shapes (not real attention —
# timing only; output reduced to keep shapes comparable)
# ---------------------------------------------------------------------------

def _probe_qk_kernel(q_ref, k_ref, v_ref, o_ref, acc_scr):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # cheap consume: accumulate s rows into (bq, 64) via slice-sum
    acc_scr[:] += s[:, :64]

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype)


def probe_qk(q, k, v, *, scale, block_q=1024, block_k=1024,
             interpret=False):
    """qk matmul only (half the attention FLOPs). TIMING PROBE."""
    bh, nq, d = q.shape
    kv = k.shape[1]
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    out = pl.pallas_call(
        _probe_qk_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q, k, v)
    return out


def _probe_qk_bf_kernel(q_ref, k_ref, v_ref, o_ref, acc_scr):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    s = jax.lax.dot_general(q_ref[0], k_ref[0], (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.bfloat16)
    acc_scr[:] += s[:, :64].astype(jnp.float32)

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype)


def probe_qk_bf(q, k, v, *, scale, block_q=1024, block_k=1024,
                interpret=False):
    """qk matmul with bf16 output. TIMING PROBE."""
    bh, nq, d = q.shape
    kv = k.shape[1]
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    out = pl.pallas_call(
        _probe_qk_bf_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=100 * 2 ** 20),
        interpret=interpret,
    )(q, k, v)
    return out


VARIANTS["nmbf"] = fwd_nmbf
VARIANTS["probe_qk"] = probe_qk
VARIANTS["probe_qk_bf"] = probe_qk_bf


def _probe_qkpv_kernel(q_ref, k_ref, v_ref, o_ref, acc_scr):
    """qk -> cast bf16 -> pv: both matmuls + the cast, NO softmax."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    v = v_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    acc_scr[:] += jax.lax.dot_general(
        (s * 1e-4).astype(v.dtype), v, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0] = acc_scr[:].astype(o_ref.dtype)


def probe_qkpv(q, k, v, *, scale, block_q=1024, block_k=1024,
               interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    return pl.pallas_call(
        _probe_qkpv_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[pltpu.VMEM((block_q, d), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(q, k, v)


def _probe_qksm_kernel(q_ref, k_ref, v_ref, o_ref, l_scr, acc_scr):
    """qk -> exp2 -> rowsum, NO pv matmul (softmax cost isolation)."""
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    @pl.when(ik == 0)
    def _init():
        l_scr[:] = jnp.zeros_like(l_scr)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    q = q_ref[0]
    k = k_ref[0]
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp2(s - 8.0)
    l_scr[:, :1] += jnp.sum(p, axis=-1, keepdims=True)

    @pl.when(ik == nk - 1)
    def _finish():
        o_ref[0] = jnp.broadcast_to(l_scr[:, :64],
                                    acc_scr.shape).astype(o_ref.dtype)


def probe_qksm(q, k, v, *, scale, block_q=1024, block_k=1024,
               interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    return pl.pallas_call(
        _probe_qksm_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((block_q, 128), jnp.float32),
            pltpu.VMEM((block_q, d), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(q, k, v)


VARIANTS["probe_qkpv"] = probe_qkpv
VARIANTS["probe_qksm"] = probe_qksm


# ---------------------------------------------------------------------------
# v_nmt: no-max + TRANSPOSED pv + MXU-fused row sums.
#   Probes show p@v with width-64 output costs ~3x the qk matmul while qk
#   (width-2048 output) runs at ~79% peak. Accumulate oT = v1^T @ pT where
#   v1 = [v | 1 | pad] (bk, 72): contraction over the kv block (K=2048,
#   full), output (72, bq) — full-width tiles, and row 64 accumulates the
#   softmax denominator for free on the MXU (no VPU sum pass).
#   VPU work per step: exp2 + bf16 cast only.
# ---------------------------------------------------------------------------

def _fwd_kernel_nmt(q_ref, k_ref, v1_ref, o_ref, c_scr, acc_scr):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    q = q_ref[0]                                       # (bq, d) pre-scaled
    k = k_ref[0]                                       # (bk, d)
    v1 = v1_ref[0]                                     # (bk, d+8): v|1|0pad
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)  # (bk, bq)

    @pl.when(ik == 0)
    def _init():
        c_scr[:] = jnp.broadcast_to(
            jnp.max(st, axis=0, keepdims=True), c_scr.shape)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    pt = jnp.exp2(st - c_scr[:1])                      # (bk, bq) f32
    acc_scr[:] += jax.lax.dot_general(
        v1, pt.astype(v1.dtype), (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)            # (d+8, bq)

    @pl.when(ik == nk - 1)
    def _finish():
        d = o_ref.shape[-1]
        l = acc_scr[d:d + 1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:d] / l).T.astype(o_ref.dtype)


def fwd_nmt(q, k, v, *, scale, block_q=1024, block_k=1024, interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    if kv % block_k:
        raise ValueError("nmt needs kv % block_k == 0")
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    # v1 = [v | 1 | 0-pad] so row d of the accumulator is the denominator
    ones = jnp.ones((bh, kv, 1), v.dtype)
    zpad = jnp.zeros((bh, kv, 7), v.dtype)
    v1 = jnp.concatenate([v, ones, zpad], axis=-1)     # (bh, kv, d+8)
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    out = pl.pallas_call(
        _fwd_kernel_nmt,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d + 8), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d + 8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(q, k, v1)
    return out


VARIANTS["nmt"] = fwd_nmt


def _fwd_kernel_nmtu2(q_ref, k_ref, v1_ref, o_ref, c_scr, acc_scr):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    q = q_ref[0]
    k = k_ref[0]
    v1 = v1_ref[0]
    half = k.shape[0] // 2
    st1 = jax.lax.dot_general(k[:half], q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    st2 = jax.lax.dot_general(k[half:], q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(ik == 0)
    def _init():
        m12 = jnp.maximum(jnp.max(st1, axis=0, keepdims=True),
                          jnp.max(st2, axis=0, keepdims=True))
        c_scr[:] = jnp.broadcast_to(m12, c_scr.shape)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    c = c_scr[:1]
    pt1 = jnp.exp2(st1 - c).astype(v1.dtype)
    pt2 = jnp.exp2(st2 - c).astype(v1.dtype)
    acc = acc_scr[:]
    acc += jax.lax.dot_general(v1[:half], pt1, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(v1[half:], pt2, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc_scr[:] = acc

    @pl.when(ik == nk - 1)
    def _finish():
        d = o_ref.shape[-1]
        l = acc_scr[d:d + 1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:d] / l).T.astype(o_ref.dtype)


def fwd_nmtu2(q, k, v, *, scale, block_q=1024, block_k=1024,
              interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    if kv % block_k:
        raise ValueError("nmtu2 needs kv % block_k == 0")
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    ones = jnp.ones((bh, kv, 1), v.dtype)
    zpad = jnp.zeros((bh, kv, 7), v.dtype)
    v1 = jnp.concatenate([v, ones, zpad], axis=-1)
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    out = pl.pallas_call(
        _fwd_kernel_nmtu2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d + 8), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d + 8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(q, k, v1)
    return out


VARIANTS["nmtu2"] = fwd_nmtu2


# ---------------------------------------------------------------------------
# v_nmth2: nmt processing TWO heads per grid step — each head's exp (VPU)
# can overlap the other head's matmuls (MXU), fully independent work.
# ---------------------------------------------------------------------------

def _fwd_kernel_nmth2(q_ref, k_ref, v1_ref, o_ref, c_scr, acc_scr):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    sts = [jax.lax.dot_general(k_ref[h], q_ref[h], (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
           for h in range(2)]

    @pl.when(ik == 0)
    def _init():
        for h in range(2):
            c_scr[h] = jnp.broadcast_to(
                jnp.max(sts[h], axis=0, keepdims=True), c_scr.shape[1:])
        acc_scr[:] = jnp.zeros_like(acc_scr)

    d = o_ref.shape[-1]
    for h in range(2):
        pt = jnp.exp2(sts[h] - c_scr[h, :1]).astype(v1_ref.dtype)
        acc_scr[h] += jax.lax.dot_general(
            v1_ref[h], pt, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finish():
        for h in range(2):
            l = acc_scr[h, d:d + 1]
            l = jnp.where(l == 0.0, 1.0, l)
            o_ref[h] = (acc_scr[h, :d] / l).T.astype(o_ref.dtype)


def fwd_nmth2(q, k, v, *, scale, block_q=1024, block_k=1024,
              interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    if bh % 2 or kv % block_k:
        raise ValueError("nmth2 needs even heads and kv % block_k == 0")
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    ones = jnp.ones((bh, kv, 1), v.dtype)
    zpad = jnp.zeros((bh, kv, 7), v.dtype)
    v1 = jnp.concatenate([v, ones, zpad], axis=-1)
    grid = (bh // 2, _cdiv(nq, block_q), kv // block_k)
    out = pl.pallas_call(
        _fwd_kernel_nmth2,
        grid=grid,
        in_specs=[
            pl.BlockSpec((2, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((2, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((2, block_k, d + 8), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((2, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((2, 8, block_q), jnp.float32),
            pltpu.VMEM((2, d + 8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(q, k, v1)
    return out


VARIANTS["nmth2"] = fwd_nmth2


# ---------------------------------------------------------------------------
# v_nmti8: nmt with int8 q@k^T (v5e has 2x int8 MACs). Per-token (row)
# symmetric scales for q and k computed outside the kernel; the rank-1
# scale correction sq_i*sk_j is applied to the f32 scores before exp
# (softmax is NOT scale-invariant, so it cannot be folded). Inference path.
# ---------------------------------------------------------------------------

def _fwd_kernel_nmti8(q_ref, k_ref, v1_ref, sq_ref, sk_ref, o_ref,
                      c_scr, acc_scr):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    q = q_ref[0]                                       # (bq, d) int8
    k = k_ref[0]                                       # (bk, d) int8
    v1 = v1_ref[0]
    st = jax.lax.dot_general(k, q, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.int32)
    # scale correction: s = st * sk_i * sq_j (outer product, fused with exp)
    st = st.astype(jnp.float32) * (sk_ref[0] * sq_ref[0].T)

    @pl.when(ik == 0)
    def _init():
        c_scr[:] = jnp.broadcast_to(
            jnp.max(st, axis=0, keepdims=True), c_scr.shape)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    pt = jnp.exp2(st - c_scr[:1]).astype(v1.dtype)
    acc_scr[:] += jax.lax.dot_general(
        v1, pt, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)

    @pl.when(ik == nk - 1)
    def _finish():
        d = o_ref.shape[-1]
        l = acc_scr[d:d + 1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:d] / l).T.astype(o_ref.dtype)


def fwd_nmti8(q, k, v, *, scale, block_q=1024, block_k=1024,
              interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    if kv % block_k:
        raise ValueError("nmti8 needs kv % block_k == 0")
    qf = q.astype(jnp.float32) * (scale * LOG2E)
    sq = jnp.max(jnp.abs(qf), axis=-1, keepdims=True) / 127.0  # (bh, nq, 1)
    sq = jnp.where(sq == 0, 1.0, sq)
    q8 = jnp.clip(jnp.round(qf / sq), -127, 127).astype(jnp.int8)
    kf = k.astype(jnp.float32)
    sk = jnp.max(jnp.abs(kf), axis=-1, keepdims=True) / 127.0
    sk = jnp.where(sk == 0, 1.0, sk)
    k8 = jnp.clip(jnp.round(kf / sk), -127, 127).astype(jnp.int8)
    ones = jnp.ones((bh, kv, 1), v.dtype)
    zpad = jnp.zeros((bh, kv, 7), v.dtype)
    v1 = jnp.concatenate([v, ones, zpad], axis=-1)
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    out = pl.pallas_call(
        _fwd_kernel_nmti8,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d + 8), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, 1), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d + 8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(q8, k8, v1, sq, sk)
    return out


VARIANTS["nmti8"] = fwd_nmti8


# ---------------------------------------------------------------------------
# Round-2b int8 refinements. The SHIPPED int8 kernel (ops/attention._fwd_i8)
# has NO sub-block unroll — the bf16 kernel's u2 trick (independent MXU/VPU
# work per grid step) never made it into the int8 path. Variants:
#   i8u2  — int8 q@k^T, per-head SMEM scalar scales, 2 kv sub-blocks/step
#   i8bx  — int8 q@k^T + bf16 exp2 (halves the dominant VPU pass if Mosaic
#           runs bf16 transcendentals at 2x lane rate)
#   i8u2bx — both
#   nmtu2bx — the bf16 kernel with bf16 exp2 (isolates the exp-cost lever)
# ---------------------------------------------------------------------------


def _fwd_kernel_i8u(q_ref, k_ref, v1_ref, sq_ref, sk_ref, o_ref,
                    c_scr, acc_scr, *, unroll: int, bf16_exp: bool):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)
    b = pl.program_id(0)

    q = q_ref[0]                                       # (bq, d) int8
    sub = k_ref.shape[1] // unroll
    scale = sk_ref[b] * sq_ref[b]
    sts = []
    for u in range(unroll):
        k_u = k_ref[0][u * sub:(u + 1) * sub]
        st = jax.lax.dot_general(k_u, q, (((1,), (1,)), ((), ())),
                                 preferred_element_type=jnp.int32)
        sts.append(st.astype(jnp.float32) * scale)

    @pl.when(ik == 0)
    def _init():
        m = jnp.max(sts[0], axis=0, keepdims=True)
        for st in sts[1:]:
            m = jnp.maximum(m, jnp.max(st, axis=0, keepdims=True))
        c_scr[:] = jnp.broadcast_to(m, c_scr.shape)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    c = c_scr[:1]
    acc = acc_scr[:]
    for u in range(unroll):
        v_u = v1_ref[0][u * sub:(u + 1) * sub]
        if bf16_exp:
            pt = jnp.exp2((sts[u] - c).astype(jnp.bfloat16))
        else:
            pt = jnp.exp2(sts[u] - c).astype(v_u.dtype)
        acc += jax.lax.dot_general(v_u, pt, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    acc_scr[:] = acc

    @pl.when(ik == nk - 1)
    def _finish():
        d = o_ref.shape[-1]
        l = acc_scr[d:d + 1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:d] / l).T.astype(o_ref.dtype)


def _fwd_i8u(q, k, v, *, scale, block_q, block_k, unroll, bf16_exp,
             interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    if kv % block_k:
        raise ValueError("i8u needs kv % block_k == 0")
    qf = q.astype(jnp.float32) * (scale * LOG2E)
    sq = jnp.max(jnp.abs(qf), axis=(1, 2), keepdims=True) / 127.0
    sq = jnp.where(sq == 0, 1.0, sq)
    q8 = jnp.clip(jnp.round(qf / sq), -127, 127).astype(jnp.int8)
    kf = k.astype(jnp.float32)
    sk = jnp.max(jnp.abs(kf), axis=(1, 2), keepdims=True) / 127.0
    sk = jnp.where(sk == 0, 1.0, sk)
    k8 = jnp.clip(jnp.round(kf / sk), -127, 127).astype(jnp.int8)
    sq = sq.reshape(bh)
    sk = sk.reshape(bh)
    ones = jnp.ones((bh, kv, 1), v.dtype)
    zpad = jnp.zeros((bh, kv, 7), v.dtype)
    v1 = jnp.concatenate([v, ones, zpad], axis=-1)
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_i8u, unroll=unroll, bf16_exp=bf16_exp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d + 8), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), v.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d + 8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(q8, k8, v1, sq, sk)


def fwd_i8u2(q, k, v, *, scale, block_q=1024, block_k=1024, interpret=False):
    return _fwd_i8u(q, k, v, scale=scale, block_q=block_q, block_k=block_k,
                    unroll=2, bf16_exp=False, interpret=interpret)


def fwd_i8bx(q, k, v, *, scale, block_q=1024, block_k=1024, interpret=False):
    return _fwd_i8u(q, k, v, scale=scale, block_q=block_q, block_k=block_k,
                    unroll=1, bf16_exp=True, interpret=interpret)


def fwd_i8u2bx(q, k, v, *, scale, block_q=1024, block_k=1024,
               interpret=False):
    return _fwd_i8u(q, k, v, scale=scale, block_q=block_q, block_k=block_k,
                    unroll=2, bf16_exp=True, interpret=interpret)


VARIANTS["i8u2"] = fwd_i8u2
VARIANTS["i8bx"] = fwd_i8bx
VARIANTS["i8u2bx"] = fwd_i8u2bx


def _fwd_kernel_nmtu2bx(q_ref, k_ref, v1_ref, o_ref, c_scr, acc_scr):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    q = q_ref[0]
    k = k_ref[0]
    v1 = v1_ref[0]
    half = k.shape[0] // 2
    st1 = jax.lax.dot_general(k[:half], q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    st2 = jax.lax.dot_general(k[half:], q, (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)

    @pl.when(ik == 0)
    def _init():
        m12 = jnp.maximum(jnp.max(st1, axis=0, keepdims=True),
                          jnp.max(st2, axis=0, keepdims=True))
        c_scr[:] = jnp.broadcast_to(m12, c_scr.shape)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    c = c_scr[:1]
    pt1 = jnp.exp2((st1 - c).astype(jnp.bfloat16))
    pt2 = jnp.exp2((st2 - c).astype(jnp.bfloat16))
    acc = acc_scr[:]
    acc += jax.lax.dot_general(v1[:half], pt1, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc += jax.lax.dot_general(v1[half:], pt2, (((0,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)
    acc_scr[:] = acc

    @pl.when(ik == nk - 1)
    def _finish():
        d = o_ref.shape[-1]
        l = acc_scr[d:d + 1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:d] / l).T.astype(o_ref.dtype)


def fwd_nmtu2bx(q, k, v, *, scale, block_q=1024, block_k=1024,
                interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    if kv % block_k:
        raise ValueError("nmtu2bx needs kv % block_k == 0")
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    ones = jnp.ones((bh, kv, 1), v.dtype)
    zpad = jnp.zeros((bh, kv, 7), v.dtype)
    v1 = jnp.concatenate([v, ones, zpad], axis=-1)
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    return pl.pallas_call(
        _fwd_kernel_nmtu2bx,
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d + 8), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d + 8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(q, k, v1)


VARIANTS["nmtu2bx"] = fwd_nmtu2bx


def fwd_i8u4(q, k, v, *, scale, block_q=1024, block_k=1024, interpret=False):
    return _fwd_i8u(q, k, v, scale=scale, block_q=block_q, block_k=block_k,
                    unroll=4, bf16_exp=False, interpret=interpret)


VARIANTS["i8u4"] = fwd_i8u4


def _fwd_kernel_nmtu(q_ref, k_ref, v1_ref, o_ref, c_scr, acc_scr,
                     *, unroll: int):
    ik = pl.program_id(2)
    nk = pl.num_programs(2)

    q = q_ref[0]
    sub = k_ref.shape[1] // unroll
    sts = [jax.lax.dot_general(k_ref[0][u * sub:(u + 1) * sub], q,
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)
           for u in range(unroll)]

    @pl.when(ik == 0)
    def _init():
        m = jnp.max(sts[0], axis=0, keepdims=True)
        for st in sts[1:]:
            m = jnp.maximum(m, jnp.max(st, axis=0, keepdims=True))
        c_scr[:] = jnp.broadcast_to(m, c_scr.shape)
        acc_scr[:] = jnp.zeros_like(acc_scr)

    c = c_scr[:1]
    acc = acc_scr[:]
    for u in range(unroll):
        v_u = v1_ref[0][u * sub:(u + 1) * sub]
        pt = jnp.exp2(sts[u] - c).astype(v_u.dtype)
        acc += jax.lax.dot_general(v_u, pt, (((0,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)
    acc_scr[:] = acc

    @pl.when(ik == nk - 1)
    def _finish():
        d = o_ref.shape[-1]
        l = acc_scr[d:d + 1]
        l = jnp.where(l == 0.0, 1.0, l)
        o_ref[0] = (acc_scr[:d] / l).T.astype(o_ref.dtype)


def fwd_nmtu4(q, k, v, *, scale, block_q=1024, block_k=1024,
              interpret=False):
    bh, nq, d = q.shape
    kv = k.shape[1]
    if kv % block_k:
        raise ValueError("nmtu4 needs kv % block_k == 0")
    q = (q.astype(jnp.float32) * (scale * LOG2E)).astype(q.dtype)
    ones = jnp.ones((bh, kv, 1), v.dtype)
    zpad = jnp.zeros((bh, kv, 7), v.dtype)
    v1 = jnp.concatenate([v, ones, zpad], axis=-1)
    grid = (bh, _cdiv(nq, block_q), kv // block_k)
    return pl.pallas_call(
        functools.partial(_fwd_kernel_nmtu, unroll=4),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, iq, ik: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d + 8), lambda b, iq, ik: (b, ik, 0)),
        ],
        out_specs=pl.BlockSpec((1, block_q, d), lambda b, iq, ik: (b, iq, 0)),
        out_shape=jax.ShapeDtypeStruct((bh, nq, d), q.dtype),
        scratch_shapes=[
            pltpu.VMEM((8, block_q), jnp.float32),
            pltpu.VMEM((d + 8, block_q), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary"),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(q, k, v1)


VARIANTS["nmtu4"] = fwd_nmtu4
