"""Shared transformer building blocks (flax.linen).

One block implementation serves VideoMAE encoder/decoder, VJEPA2
encoder/predictor, and DINOv2 — they differ only in bias pattern, RoPE,
layerscale/droppath, and FFN flavour, all expressed as module options.

Conventions:
- params are float32; compute dtype configurable (bf16 on TPU)
- LayerNorm statistics in float32
- attention dispatches to the Pallas flash kernel on TPU
  (smb_vision_tpu.ops.attention), XLA elsewhere
- `gelu` is the exact (erf) variant to match torch nn.GELU
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from smb_vision_tpu.ops.attention import attention
from smb_vision_tpu.ops.quant import w8a8_dot
from smb_vision_tpu.ops.rope3d import apply_rope3d

ACT2FN = {
    "gelu": lambda x: jax.nn.gelu(x, approximate=False),
    "gelu_new": lambda x: jax.nn.gelu(x, approximate=True),
    "relu": jax.nn.relu,
    "selu": jax.nn.selu,
    "silu": jax.nn.silu,
}


def trunc_normal_init(std: float):
    return nn.initializers.truncated_normal(stddev=std, lower=-2.0, upper=2.0)


class QuantDense(nn.Module):
    """Drop-in for nn.Dense that runs x@kernel on the int8 MXU (W8A8
    dynamic quantization, ops/quant.py). Identical param structure —
    checkpoints interchange freely with nn.Dense. Inference only: the
    quantization round is not differentiable."""

    features: int
    use_bias: bool = True
    dtype: jnp.dtype = jnp.bfloat16
    param_dtype: jnp.dtype = jnp.float32
    kernel_init: Callable = nn.initializers.lecun_normal()

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", self.kernel_init,
                            (x.shape[-1], self.features), self.param_dtype)
        y = w8a8_dot(x.astype(self.dtype), kernel)
        if self.use_bias:
            bias = self.param("bias", nn.initializers.zeros,
                              (self.features,), self.param_dtype)
            y = y + bias.astype(y.dtype)
        return y


class Attention(nn.Module):
    """Multi-head self-attention.

    bias_mode:
      "qkv"  — bias on q, k, v (VJEPA2, reference modeling_vjepa.py:251-253)
      "qv"   — bias on q and v only, k bias fixed at zero (the VideoMAE /
               DINOv2 q/v-bias trick, modeling_videomae.py:246-251)
      "none" — no qkv bias
    """

    hidden_size: int
    num_heads: int
    bias_mode: str = "qkv"
    out_bias: bool = True
    out_proj: bool = True   # pooler cross-attn has no o_proj (vjepa :820-823)
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    initializer_range: float = 0.02
    # sequence parallelism: tokens sharded over the mesh "model" axis; the
    # local shard still runs the flash kernel (all-gather-kv CP or ring)
    sequence_parallel: bool = False
    sp_variant: str = "gather"   # "gather" (all-gather kv) | "ring"
    quant8: bool = False         # W8A8 projections (inference only)
    # one (h, 3h) QKV matmul instead of three (h, h) ones. The isolated
    # chain probe suggested 2x (84.7 vs 40.6 TFLOP/s,
    # scripts/kexp/projk.py) but IN-MODEL this LOSES 3-5% (d64+int8
    # 6.36 vs 6.69 vol/s same-session A/B, model_bench.py qkv): XLA's
    # dot-merger already coalesces same-input narrow dots inside the
    # block, and the manual concat+slice adds copies it doesn't need.
    # Kept as a measured negative; default OFF.
    fused_qkv: bool = False
    # fused attention-glue kernels (ops/attn_glue.py): engaged by Block
    # via the `glue` argument when glue_impl == "pallas"
    glue_impl: str = "auto"

    @nn.compact
    def __call__(self, x, rope: Optional[Tuple[jax.Array, jax.Array]] = None,
                 kv: Optional[jax.Array] = None,
                 glue: Optional[dict] = None):
        b, n, _ = x.shape
        h = self.hidden_size
        head_dim = h // self.num_heads
        kinit = trunc_normal_init(self.initializer_range)
        dense_cls = QuantDense if self.quant8 else nn.Dense
        dense = lambda name, use_bias: dense_cls(  # noqa: E731
            self.hidden_size, use_bias=use_bias, dtype=self.dtype,
            param_dtype=jnp.float32, kernel_init=kinit, name=name)

        qb = self.bias_mode in ("qkv", "qv")
        kb = self.bias_mode == "qkv"
        vb = self.bias_mode in ("qkv", "qv")
        src = x if kv is None else kv
        if glue is not None:
            # whole attention half-block through the fused glue kernels:
            # qkv_ln_forward(LN prologue + projections) -> flash core ->
            # attn_out_residual(out-proj + LayerScale + residual). The
            # param tree stays identical to the unfused path
            # (_DenseParams mirrors nn.Dense's kernel/bias layout).
            from smb_vision_tpu.ops.attn_glue import (
                attn_out_residual,
                qkv_ln_forward,
            )

            assert kv is None and not self.quant8 and self.out_proj
            wq, bq_ = _DenseParams(h, kinit, qb, name="query")(h)
            wk, bk_ = _DenseParams(h, kinit, kb, name="key")(h)
            wv, bv_ = _DenseParams(h, kinit, vb, name="value")(h)
            wo, bo_ = _DenseParams(h, kinit, self.out_bias,
                                   name="proj")(h)
            q, k, v = qkv_ln_forward(
                x.astype(self.dtype), glue["lnw"], glue["lnb"],
                wq, bq_, wk, bk_, wv, bv_, eps=glue["eps"],
                impl=self.glue_impl)
            q = q.reshape(b, n, self.num_heads, head_dim)
            k = k.reshape(b, n, self.num_heads, head_dim)
            v = v.reshape(b, n, self.num_heads, head_dim)
            if rope is not None:
                cos, sin = rope
                q = apply_rope3d(q, cos, sin)
                k = apply_rope3d(k, cos, sin)
            out = self._attend(q, k, v).reshape(b, n, h)
            bo_ = jnp.zeros((h,), jnp.float32) if bo_ is None else bo_
            return attn_out_residual(x.astype(self.dtype), out, wo, bo_,
                                     layerscale=glue.get("lam"),
                                     impl=self.glue_impl)
        if self.fused_qkv and not self.quant8:
            dt = self.dtype
            wq, bq = _DenseParams(h, kinit, qb, name="query")(x.shape[-1])
            wk, bk = _DenseParams(h, kinit, kb, name="key")(src.shape[-1])
            wv, bv = _DenseParams(h, kinit, vb, name="value")(
                src.shape[-1])
            zeros = jnp.zeros((h,), jnp.float32)

            def fused(inp, ws, bs, flags):
                y = inp.astype(dt) @ jnp.concatenate(ws, 1).astype(dt)
                if any(flags):
                    y = y + jnp.concatenate(
                        [bb if f else zeros for bb, f in zip(bs, flags)]
                    ).astype(dt)
                return y

            if kv is None:
                qkv = fused(x, (wq, wk, wv), (bq, bk, bv), (qb, kb, vb))
                q, k, v = (qkv[..., :h], qkv[..., h:2 * h],
                           qkv[..., 2 * h:])
            else:
                q = fused(x, (wq,), (bq,), (qb,))
                kv_p = fused(kv, (wk, wv), (bk, bv), (kb, vb))
                k, v = kv_p[..., :h], kv_p[..., h:]
            q = q.reshape(b, n, self.num_heads, head_dim)
            k = k.reshape(b, src.shape[1], self.num_heads, head_dim)
            v = v.reshape(b, src.shape[1], self.num_heads, head_dim)
        else:
            q = dense("query", qb)(x).reshape(b, n, self.num_heads,
                                              head_dim)
            k = dense("key", kb)(src).reshape(b, src.shape[1],
                                              self.num_heads, head_dim)
            v = dense("value", vb)(src).reshape(b, src.shape[1],
                                                self.num_heads, head_dim)

        if rope is not None:
            cos, sin = rope
            q = apply_rope3d(q, cos, sin)
            k = apply_rope3d(k, cos, sin)

        out = self._attend(q, k, v, cross=kv is not None)
        out = out.reshape(b, n, self.hidden_size)
        if not self.out_proj:
            return out
        return dense("proj", self.out_bias)(out)

    def _attend(self, q, k, v, cross: bool = False):
        if self.sequence_parallel and not cross:
            from smb_vision_tpu.parallel.context import (
                context_parallel_attention,
                ring_attention,
            )
            from smb_vision_tpu.parallel.mesh import DATA_AXIS, MODEL_AXIS

            mesh = jax.sharding.get_abstract_mesh()
            if mesh.empty:
                raise ValueError(
                    "sequence_parallel=True needs an ambient mesh: wrap the "
                    "apply/jit in `with jax.set_mesh(mesh):`")
            if self.sp_variant == "ring":
                return ring_attention(q, k, v, mesh=mesh, axis=MODEL_AXIS,
                                      impl=self.attn_impl,
                                      batch_axis=DATA_AXIS)
            return context_parallel_attention(
                q, k, v, mesh=mesh, axis=MODEL_AXIS,
                impl=self.attn_impl, batch_axis=DATA_AXIS)
        return attention(q, k, v, impl=self.attn_impl)


class _DenseParams(nn.Module):
    """Parameter holder with nn.Dense's exact param structure
    (kernel/bias under the module name) for ops that consume raw
    weights — checkpoints interchange freely with nn.Dense."""

    features: int
    kernel_init: Callable
    use_bias: bool = True

    @nn.compact
    def __call__(self, in_features: int):
        kernel = self.param("kernel", self.kernel_init,
                            (in_features, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32) \
            if self.use_bias else None
        return kernel, bias


class _MlpParams(nn.Module):
    """fc1/fc2 raw weights with the Mlp module's exact param tree, for
    the fused half-block kernel (ops/mlp.py::mlp_block_forward)."""

    hidden_size: int
    intermediate_size: int
    kernel_init: Callable

    @nn.compact
    def __call__(self, in_features: int):
        w1, b1 = _DenseParams(self.intermediate_size, self.kernel_init,
                              name="fc1")(in_features)
        w2, b2 = _DenseParams(self.hidden_size, self.kernel_init,
                              name="fc2")(self.intermediate_size)
        return w1, b1, w2, b2


class _SwiGLUParams(nn.Module):
    """weights_in/weights_out raw weights with the SwiGLU module's exact
    param tree, for the fused half-block kernel."""

    hidden_size: int
    intermediate_size: int
    kernel_init: Callable

    @nn.compact
    def __call__(self, in_features: int):
        w_in, b_in = _DenseParams(2 * self.intermediate_size,
                                  self.kernel_init,
                                  name="weights_in")(in_features)
        w_out, b_out = _DenseParams(self.hidden_size, self.kernel_init,
                                    name="weights_out")(
            self.intermediate_size)
        return w_in, b_in, w_out, b_out


class _LayerNormParams(nn.Module):
    """scale/bias with nn.LayerNorm's param tree, consumed raw by the
    fused half-block kernel."""

    features: int

    @nn.compact
    def __call__(self):
        scale = self.param("scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        return scale, bias


class Mlp(nn.Module):
    """fc1 -> act -> fc2. mlp_impl routes gelu-family MLPs through the
    fused Pallas kernel on TPU (ops/mlp.py: one kernel, the (N, F)
    intermediate never leaves VMEM — +34% over the XLA chain on v5e);
    'auto' falls back to plain XLA off-TPU, for non-gelu acts, and for
    shapes the kernel can't map (e.g. DINOv2's odd CLS-token rows)."""

    hidden_size: int
    intermediate_size: int
    act: str = "gelu"
    dtype: jnp.dtype = jnp.bfloat16
    initializer_range: float = 0.02
    quant8: bool = False
    mlp_impl: str = "auto"

    @nn.compact
    def __call__(self, x):
        if self.mlp_impl not in ("auto", "pallas", "pallas_bwd", "xla"):
            raise ValueError(
                f"unknown mlp impl {self.mlp_impl!r}; "
                "valid: 'auto', 'pallas', 'pallas_bwd', 'xla'")
        kinit = trunc_normal_init(self.initializer_range)
        # auto only engages for bf16 compute: the kernel computes in
        # bf16, so an f32-configured model must not silently degrade
        route = (self.mlp_impl in ("pallas", "pallas_bwd")
                 or (self.mlp_impl == "auto"
                     and self.dtype == jnp.bfloat16))
        if not self.quant8 and self.act in ("gelu", "gelu_new") \
                and route:
            from smb_vision_tpu.ops.mlp import mlp_forward

            w1, b1 = _DenseParams(self.intermediate_size, kinit,
                                  name="fc1")(x.shape[-1])
            w2, b2 = _DenseParams(self.hidden_size, kinit,
                                  name="fc2")(self.intermediate_size)
            return mlp_forward(x.astype(self.dtype), w1, b1, w2, b2,
                               act=self.act, impl=self.mlp_impl)
        dense_cls = QuantDense if self.quant8 else nn.Dense
        x = dense_cls(self.intermediate_size, dtype=self.dtype,
                      param_dtype=jnp.float32, kernel_init=kinit,
                      name="fc1")(x)
        x = ACT2FN[self.act](x)
        x = dense_cls(self.hidden_size, dtype=self.dtype,
                      param_dtype=jnp.float32, kernel_init=kinit,
                      name="fc2")(x)
        return x


class SwiGLU(nn.Module):
    """SwiGLU FFN (DINOv2 use_swiglu_ffn path)."""

    hidden_size: int
    intermediate_size: int
    dtype: jnp.dtype = jnp.bfloat16
    initializer_range: float = 0.02

    @nn.compact
    def __call__(self, x):
        kinit = trunc_normal_init(self.initializer_range)
        h = nn.Dense(2 * self.intermediate_size, dtype=self.dtype,
                     param_dtype=jnp.float32, kernel_init=kinit,
                     name="weights_in")(x)
        x1, x2 = jnp.split(h, 2, axis=-1)
        return nn.Dense(self.hidden_size, dtype=self.dtype,
                        param_dtype=jnp.float32, kernel_init=kinit,
                        name="weights_out")(jax.nn.silu(x1) * x2)


class DropPath(nn.Module):
    """Stochastic depth per sample (modeling_vjepa.py:375-392).

    `rate` is the static per-layer rate; `rate_override` (a traced f32
    scalar) replaces it at call time so one shared Block can apply a
    per-layer schedule from a scanned operand (the pipelined layout,
    models/pipelined.py — per-layer rates ride a stacked leaf there)."""

    rate: float

    @nn.compact
    def __call__(self, x, deterministic: bool = True, rate_override=None):
        if deterministic or (rate_override is None and self.rate == 0.0):
            return x
        r = self.rate if rate_override is None else rate_override
        keep = 1.0 - jnp.asarray(r, x.dtype)
        rng = self.make_rng("droppath")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jnp.floor(keep + jax.random.uniform(rng, shape, x.dtype))
        return x / keep * mask


class Block(nn.Module):
    """Pre-LN transformer block:
    x += [droppath][layerscale] attn(LN(x)); x += [..] mlp(LN(x))."""

    hidden_size: int
    num_heads: int
    intermediate_size: int
    act: str = "gelu"
    bias_mode: str = "qkv"
    layer_norm_eps: float = 1e-6
    layerscale_value: Optional[float] = None
    drop_path_rate: float = 0.0
    use_swiglu: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    initializer_range: float = 0.02
    sequence_parallel: bool = False
    sp_variant: str = "gather"
    quant8: bool = False
    mlp_impl: str = "auto"
    fused_qkv: bool = False
    glue_impl: str = "auto"

    @nn.compact
    def __call__(self, x, rope=None, deterministic: bool = True,
                 dp_rate=None):
        # dp_rate: optional TRACED f32 scalar overriding the static
        # drop_path_rate — the pipelined layout ships the per-layer
        # stochastic-depth schedule as a stacked leaf (pipelined_encoder)
        ln = lambda name: nn.LayerNorm(  # noqa: E731
            epsilon=self.layer_norm_eps, dtype=self.dtype,
            param_dtype=jnp.float32, name=name)

        def scaled(name, h):
            if self.layerscale_value is None:
                return h
            lam = self.param(name, nn.initializers.constant(
                self.layerscale_value), (self.hidden_size,), jnp.float32)
            return h * lam.astype(h.dtype)

        dp_off = deterministic or (dp_rate is None
                                   and self.drop_path_rate == 0.0)
        base = DropPath(self.drop_path_rate)
        dp = lambda h, det: base(h, det, rate_override=dp_rate)  # noqa: E731
        if self.glue_impl not in ("auto", "pallas", "xla"):
            raise ValueError(f"unknown glue impl {self.glue_impl!r}; "
                             "valid: 'auto', 'pallas', 'xla'")
        # attention half-block through the fused glue kernels
        # (ops/attn_glue.py) — explicit opt-in only: isolated A/B flat,
        # in-model -13% (BENCHMARKS.md "attention half-block"), so
        # "auto" keeps the plain path, unlike mlp_impl's auto-fuse
        fuse_attn = (self.glue_impl == "pallas" and not self.quant8
                     and not self.fused_qkv and dp_off)
        attn = Attention(self.hidden_size, self.num_heads,
                         bias_mode=self.bias_mode, dtype=self.dtype,
                         attn_impl=self.attn_impl,
                         initializer_range=self.initializer_range,
                         sequence_parallel=self.sequence_parallel,
                         sp_variant=self.sp_variant, quant8=self.quant8,
                         fused_qkv=self.fused_qkv,
                         glue_impl=self.glue_impl,
                         name="attention")
        if fuse_attn:
            lnw1, lnb1 = _LayerNormParams(self.hidden_size,
                                          name="norm1")()
            lam1 = None
            if self.layerscale_value is not None:
                lam1 = self.param(
                    "layerscale1", nn.initializers.constant(
                        self.layerscale_value),
                    (self.hidden_size,), jnp.float32)
            x = attn(x, rope=rope,
                     glue=dict(lnw=lnw1, lnb=lnb1, lam=lam1,
                               eps=self.layer_norm_eps))
        else:
            h = attn(ln("norm1")(x), rope=rope)
            x = x + dp(scaled("layerscale1", h), deterministic)

        # the whole MLP half-block (LN -> fc1 -> gelu -> fc2
        # [-> layerscale] -> residual) fuses into ONE pallas kernel when
        # nothing non-foldable sits in the chain (DropPath active =
        # per-sample random scale; SwiGLU/quant8 have their own paths).
        # LayerScale folds into w2/b2. Params keep the norm2/mlp trees.
        if self.mlp_impl not in ("auto", "pallas", "pallas_bwd", "xla"):
            raise ValueError(
                f"unknown mlp impl {self.mlp_impl!r}; "
                "valid: 'auto', 'pallas', 'pallas_bwd', 'xla'")
        # gelu MLPs auto-fuse on TPU (+30% over the XLA chain) for bf16
        # compute (the kernel is bf16 — f32 models must not silently
        # degrade); the swiglu kernel measured FLAT vs XLA
        # (BENCHMARKS.md) so it runs only on explicit mlp_impl="pallas".
        # "pallas_bwd" (the pallas-backward training path) has no
        # half-block variant: it skips this fusion and routes LN + Mlp
        # separately below, with the Mlp's fwd AND bwd in-kernel.
        route = (self.mlp_impl == "pallas"
                 if self.use_swiglu else
                 (self.mlp_impl == "pallas"
                  or (self.mlp_impl == "auto"
                      and self.dtype == jnp.bfloat16
                      and jax.devices()[0].platform == "tpu")))
        fuse_block = (not self.quant8 and route
                      and (self.use_swiglu
                           or self.act in ("gelu", "gelu_new"))
                      and dp_off)
        if fuse_block:
            from smb_vision_tpu.ops.mlp import (
                mlp_block_forward,
                swiglu_block_forward,
            )

            lnw, lnb = _LayerNormParams(self.hidden_size,
                                        name="norm2")()
            kinit = trunc_normal_init(self.initializer_range)
            if self.use_swiglu:
                w1, b1, w2, b2 = _SwiGLUParams(
                    self.hidden_size, self.intermediate_size, kinit,
                    name="mlp")(self.hidden_size)
            else:
                w1, b1, w2, b2 = _MlpParams(
                    self.hidden_size, self.intermediate_size, kinit,
                    name="mlp")(self.hidden_size)
            if self.layerscale_value is not None:
                lam = self.param("layerscale2", nn.initializers.constant(
                    self.layerscale_value), (self.hidden_size,),
                    jnp.float32)
                w2 = w2 * lam[None, :]
                b2 = b2 * lam
            if self.use_swiglu:
                return swiglu_block_forward(x.astype(self.dtype), lnw,
                                            lnb, w1, b1, w2, b2,
                                            eps=self.layer_norm_eps,
                                            impl=self.mlp_impl)
            return mlp_block_forward(x.astype(self.dtype), lnw, lnb,
                                     w1, b1, w2, b2, act=self.act,
                                     eps=self.layer_norm_eps,
                                     impl=self.mlp_impl)

        if self.use_swiglu:
            h = SwiGLU(self.hidden_size, self.intermediate_size,
                       dtype=self.dtype,
                       initializer_range=self.initializer_range,
                       name="mlp")(ln("norm2")(x))
        else:
            h = Mlp(self.hidden_size, self.intermediate_size, act=self.act,
                    dtype=self.dtype,
                    initializer_range=self.initializer_range,
                    quant8=self.quant8, mlp_impl=self.mlp_impl,
                    name="mlp")(ln("norm2")(x))
        x = x + dp(scaled("layerscale2", h), deterministic)
        return x


class Encoder(nn.Module):
    """Stack of Blocks with optional remat (gradient checkpointing — the
    reference enables this via --gradient_checkpointing, run_mim.sh:34) and
    optional sequence parallelism: tokens sharded over the mesh "model"
    axis. The norms/MLP partition via GSPMD sharding constraints while the
    attention runs the flash kernel per shard through shard_map
    (context_parallel_attention / ring_attention) — the round-1 version
    fell back to O(N^2) XLA attention here."""

    num_layers: int
    hidden_size: int
    num_heads: int
    intermediate_size: int
    act: str = "gelu"
    bias_mode: str = "qkv"
    layer_norm_eps: float = 1e-6
    layerscale_value: Optional[float] = None
    drop_path_rate: float = 0.0
    use_swiglu: bool = False
    dtype: jnp.dtype = jnp.bfloat16
    attn_impl: str = "auto"
    remat: bool = False
    initializer_range: float = 0.02
    sequence_parallel: bool = False
    sp_variant: str = "gather"
    quant8: bool = False
    mlp_impl: str = "auto"
    fused_qkv: bool = False
    glue_impl: str = "auto"

    @nn.compact
    def __call__(self, x, rope=None, deterministic: bool = True):
        constrain = lambda y: y  # noqa: E731
        if self.sequence_parallel:
            from jax.sharding import PartitionSpec as P

            constrain = lambda y: jax.lax.with_sharding_constraint(  # noqa: E731
                y, P("data", "model", None))
            x = constrain(x)
        block_cls = Block
        if self.remat:
            block_cls = nn.remat(Block, static_argnums=(3,),
                                 prevent_cse=False)
        for i in range(self.num_layers):
            rate = (self.drop_path_rate * i / max(self.num_layers - 1, 1))
            x = block_cls(
                self.hidden_size, self.num_heads, self.intermediate_size,
                act=self.act, bias_mode=self.bias_mode,
                layer_norm_eps=self.layer_norm_eps,
                layerscale_value=self.layerscale_value,
                drop_path_rate=rate, use_swiglu=self.use_swiglu,
                dtype=self.dtype, attn_impl=self.attn_impl,
                initializer_range=self.initializer_range,
                sequence_parallel=self.sequence_parallel,
                sp_variant=self.sp_variant, quant8=self.quant8,
                mlp_impl=self.mlp_impl, fused_qkv=self.fused_qkv,
                glue_impl=self.glue_impl,
                name=f"layer_{i}")(x, rope, deterministic)
            if self.sequence_parallel:
                x = constrain(x)
        return x
