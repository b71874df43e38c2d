"""Fused single-pass flash-attention backward (experiment).

The shipped backward (ops/attention._bwd) runs TWO passes over the N^2
score space — a dq pass (grid b, iq, ik) and a dkv pass (grid b, ik, iq) —
and each recomputes s = qs@k^T and dp = do@v^T. That is 7 N^2-matmuls
(fwd 2 + bwd 5) plus two exp2 passes and two ds-mul passes.

This kernel computes dq, dk and dv in ONE pass over (ik, iq):
  s, p, dp, ds computed once;
  dv^T += do^T p      (contraction bq, output d x bk)   [as before]
  dk^T += qs^T ds     (contraction bq, output d x bk)   [as before]
  dq^T[:, iq] += k^T ds^T (contraction bk, output d x bq) [new]
The dq accumulator lives in VMEM scratch for the FULL sequence
(d, nq) f32 = 5.2 MB at the 20480-token flagship shape, accumulated
across the outer ik sweep; the dq output block (1, nq, d) stays resident
per b and slices are written during the final ik sweep.

Saves per layer: one s matmul, one dp matmul, one exp2 pass, one ds mul —
5 instead of 7 N^2 matmuls in fwd+bwd and half the bwd VPU work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LOG2E = 1.4426950408889634


def _cdiv(a, b):
    return -(-a // b)


def _bwd_fused_kernel(qs_ref, k_ref, v_ref, do_ref, lse_ref, delta_ref,
                      dq_ref, dk_ref, dv_ref, dq_scr, dk_scr, dv_scr,
                      *, scale: float, block_q: int):
    ik = pl.program_id(1)
    nk = pl.num_programs(1)
    iq = pl.program_id(2)
    nq = pl.num_programs(2)

    @pl.when(iq == 0)
    def _init_kv():
        dk_scr[:] = jnp.zeros_like(dk_scr)
        dv_scr[:] = jnp.zeros_like(dv_scr)

    qs = qs_ref[0]                                      # (bq, d) pre-scaled
    k = k_ref[0]                                        # (bk, d)
    v = v_ref[0]
    do = do_ref[0]                                      # (bq, d)
    lse = lse_ref[0]                                    # (bq, 1) log2 units
    delta = delta_ref[0]                                # (bq, 1)

    s = jax.lax.dot_general(qs, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (bq, bk)
    p = jnp.exp2(s - lse)
    p16 = p.astype(qs.dtype)
    dp = jax.lax.dot_general(do, v, (((1,), (1,)), ((), ())),
                             preferred_element_type=jnp.float32)
    ds = (p * (dp - delta)).astype(qs.dtype)            # (bq, bk) bf16

    # dv^T += do^T p; dk^T += qs^T ds (contraction over bq, full width)
    dv_scr[:] += jax.lax.dot_general(do, p16, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)
    dk_scr[:] += jax.lax.dot_general(qs, ds, (((0,), (0,)), ((), ())),
                                     preferred_element_type=jnp.float32)

    # dq^T[:, iq block] accumulated across the OUTER ik sweep
    contrib = jax.lax.dot_general(k, ds, (((0,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
    sl = (slice(None), pl.ds(iq * block_q, block_q))

    @pl.when(ik == 0)
    def _dq_first():
        dq_scr[sl] = contrib

    @pl.when(ik != 0)
    def _dq_acc():
        dq_scr[sl] += contrib

    @pl.when(iq == nq - 1)
    def _flush_kv():
        dk_ref[0] = (dk_scr[:] * (1.0 / LOG2E)).T.astype(dk_ref.dtype)
        dv_ref[0] = dv_scr[:].T.astype(dv_ref.dtype)

    @pl.when(ik == nk - 1)
    def _flush_dq():
        dq_ref[0, pl.ds(iq * block_q, block_q), :] = (
            dq_scr[sl] * scale).T.astype(dq_ref.dtype)


def bwd_fused(qs, k, v, do, lse, delta, *, scale, block_q, block_k,
              interpret=False):
    """qs pre-scaled by scale*log2e; lse/delta (bh, nq, 1) f32.
    Returns (dq, dk, dv). Requires nq % block_q == 0 and kv % block_k == 0
    (the model shapes are padded to tiles upstream)."""
    bh, nq, d = qs.shape
    kv = k.shape[1]
    if nq % block_q or kv % block_k:
        raise ValueError("bwd_fused needs tile-divisible sequence lengths")

    grid = (bh, kv // block_k, nq // block_q)
    dq, dk, dv = pl.pallas_call(
        functools.partial(_bwd_fused_kernel, scale=scale, block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_q, d), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, ik, iq: (b, iq, 0)),
            pl.BlockSpec((1, block_q, 1), lambda b, ik, iq: (b, iq, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, nq, d), lambda b, ik, iq: (b, 0, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
            pl.BlockSpec((1, block_k, d), lambda b, ik, iq: (b, ik, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((bh, nq, d), qs.dtype),
            jax.ShapeDtypeStruct((bh, kv, d), k.dtype),
            jax.ShapeDtypeStruct((bh, kv, d), v.dtype),
        ],
        scratch_shapes=[
            pltpu.VMEM((d, nq), jnp.float32),
            pltpu.VMEM((d, block_k), jnp.float32),
            pltpu.VMEM((d, block_k), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "arbitrary", "arbitrary"),
            vmem_limit_bytes=110 * 2 ** 20),
        interpret=interpret,
    )(qs, k, v, do, lse, delta)
    return dq, dk, dv
