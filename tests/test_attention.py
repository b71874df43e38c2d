"""Flash-attention kernel numerics (interpret mode on CPU; the same kernel
runs compiled on TPU — verified in bench)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smb_vision_tpu.ops.attention import attention, xla_attention


def _qkv(key, b=2, n=192, h=3, d=48):
    ks = jax.random.split(key, 3)
    return [jax.random.normal(k, (b, n, h, d), jnp.float32) * 0.4 for k in ks]


def test_forward_matches_xla():
    q, k, v = _qkv(jax.random.PRNGKey(0))
    ref = xla_attention(q, k, v)
    out = attention(q, k, v, impl="pallas", interpret=True,
                    block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_forward_unaligned_seq():
    # seq length not divisible by blocks exercises the kv-padding mask
    q, k, v = _qkv(jax.random.PRNGKey(1), n=100)
    ref = xla_attention(q, k, v)
    out = attention(q, k, v, impl="pallas", interpret=True,
                    block_q=64, block_k=64)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=2e-5, rtol=2e-5)


def test_grads_match_xla():
    q, k, v = _qkv(jax.random.PRNGKey(2), n=128)

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    def loss_pal(q, k, v):
        return jnp.sum(attention(q, k, v, impl="pallas", interpret=True,
                                 block_q=64, block_k=64) ** 2)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    g_pal = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_ref, g_pal):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   atol=5e-4, rtol=5e-4)


def test_bias_routes_to_xla():
    q, k, v = _qkv(jax.random.PRNGKey(3), n=64)
    bias = jnp.where(
        jax.random.bernoulli(jax.random.PRNGKey(4), 0.5, (1, 1, 64, 64)),
        0.0, -1e30)
    out = attention(q, k, v, bias=bias, impl="auto")
    assert out.shape == q.shape
    with pytest.raises(NotImplementedError):
        attention(q, k, v, bias=bias, impl="pallas")


def test_softmax_rows_sum_to_one_property():
    # attention of constant v must return v
    q, k, _ = _qkv(jax.random.PRNGKey(5), n=96)
    v = jnp.ones_like(q)
    out = attention(q, k, v, impl="pallas", interpret=True,
                    block_q=32, block_k=32)
    np.testing.assert_allclose(np.asarray(out), 1.0, atol=1e-5)


def test_int8_forward_matches_xla():
    """pallas_int8 inference path: per-row int8 q@k^T with rank-1 scale
    correction — accuracy within bf16 noise of the f32-softmax reference."""
    q, k, v = _qkv(jax.random.PRNGKey(5), n=256)
    ref = xla_attention(q, k, v)
    out = attention(q, k, v, impl="pallas_int8", interpret=True,
                    block_q=128, block_k=128)
    rel = float(jnp.abs(out.astype(jnp.float32)
                        - ref.astype(jnp.float32)).max()
                / jnp.abs(ref.astype(jnp.float32)).max())
    assert rel < 2e-2, rel


def test_int8_forward_unaligned_seq():
    q, k, v = _qkv(jax.random.PRNGKey(6), n=100)
    ref = xla_attention(q, k, v)
    out = attention(q, k, v, impl="pallas_int8", interpret=True,
                    block_q=64, block_k=64)
    rel = float(jnp.abs(out.astype(jnp.float32)
                        - ref.astype(jnp.float32)).max()
                / jnp.abs(ref.astype(jnp.float32)).max())
    assert rel < 2e-2, rel


def test_int8pv_forward_matches_xla():
    """pallas_int8pv: p@v also on the int8 MXU (per-sub-block p
    requantization against the block's own score max)."""
    q, k, v = _qkv(jax.random.PRNGKey(7), n=256)
    ref = xla_attention(q, k, v)
    out = attention(q, k, v, impl="pallas_int8pv", interpret=True,
                    block_q=128, block_k=128)
    rel = float(jnp.abs(out.astype(jnp.float32)
                        - ref.astype(jnp.float32)).max()
                / jnp.abs(ref.astype(jnp.float32)).max())
    assert rel < 3e-2, rel


def test_int8pv_forward_unaligned_seq():
    q, k, v = _qkv(jax.random.PRNGKey(8), n=100)
    ref = xla_attention(q, k, v)
    out = attention(q, k, v, impl="pallas_int8pv", interpret=True,
                    block_q=64, block_k=64)
    rel = float(jnp.abs(out.astype(jnp.float32)
                        - ref.astype(jnp.float32)).max()
                / jnp.abs(ref.astype(jnp.float32)).max())
    assert rel < 3e-2, rel


def test_int8_u8_unroll_matches_xla():
    """u8 is the compiled int8 default for block_k>=2048 (round-3 sweep:
    10.33 vs 11.33 ms/layer, scripts/kexp/i8v3.py); force it at test-size
    blocks so interpret mode covers the 8-deep unrolled chain, aligned
    and ragged."""
    from smb_vision_tpu.ops.attention import _fwd_i8

    for n in (256, 200):                       # 200 ragged vs block 64
        q, k, v = _qkv(jax.random.PRNGKey(11), n=n)
        ref = xla_attention(q, k, v)

        def fold(x):
            return jnp.swapaxes(x, 1, 2).reshape(-1, x.shape[1], x.shape[-1])

        out = _fwd_i8(fold(q), fold(k), fold(v), scale=48 ** -0.5,
                      block_q=64, block_k=64, unroll=8, interpret=True)
        out = jnp.swapaxes(out.reshape(ref.shape[0], -1, n, ref.shape[-1]),
                           1, 2)
        rel = float(jnp.abs(out.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max()
                    / jnp.abs(ref.astype(jnp.float32)).max())
        assert rel < 2e-2, (n, rel)


def test_bf16_fwd_u8_unroll_matches_xla():
    """u8 is the compiled bf16 FORWARD default for block_k>=2048 (13.48 vs
    15.74 ms/layer same-session, scripts/kexp/bf16_u8.py; bwd stays u4);
    force it at test-size blocks so interpret mode covers the 8-deep
    unrolled chain, aligned and ragged."""
    from smb_vision_tpu.ops.attention import _fwd

    for n in (256, 200):                       # 200 ragged vs block 64
        q, k, v = _qkv(jax.random.PRNGKey(12), n=n)
        ref = xla_attention(q, k, v)

        def fold(x):
            return jnp.swapaxes(x, 1, 2).reshape(-1, x.shape[1], x.shape[-1])

        out, _ = _fwd(fold(q), fold(k), fold(v), scale=48 ** -0.5,
                      block_q=64, block_k=64, unroll=8, interpret=True)
        out = jnp.swapaxes(out.reshape(ref.shape[0], -1, n, ref.shape[-1]),
                           1, 2)
        rel = float(jnp.abs(out.astype(jnp.float32)
                            - ref.astype(jnp.float32)).max()
                    / jnp.abs(ref.astype(jnp.float32)).max())
        assert rel < 1e-2, (n, rel)


def test_grads_match_xla_u4_unroll(monkeypatch):
    """The u4 sub-block unroll paths (fwd + both bwd passes) are the
    compiled default for block>=1024; force them at test-size blocks so
    interpret mode covers the unrolled code, including ragged tails."""
    import smb_vision_tpu.ops.attention as A

    monkeypatch.setattr(A, "_pick_unroll",
                        lambda blk, **kw: 4 if blk % 4 == 0 else 1)
    q, k, v = _qkv(jax.random.PRNGKey(9), n=100)  # ragged vs block 64

    def loss_ref(q, k, v):
        return jnp.sum(xla_attention(q, k, v) ** 2)

    def loss_pal(q, k, v):
        return jnp.sum(attention(q, k, v, impl="pallas", interpret=True,
                                 block_q=64, block_k=64) ** 2)

    gr = jax.grad(loss_ref, argnums=(0, 1, 2))(q, k, v)
    gp = jax.grad(loss_pal, argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(gp, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=5e-4, rtol=5e-4)


def test_unknown_impl_raises():
    """A typo like 'pallas_int8_pv' must error, not silently run a
    different precision path (round-2 ADVICE)."""
    import pytest

    q = jnp.zeros((1, 8, 1, 8))
    with pytest.raises(ValueError, match="unknown attention impl"):
        attention(q, q, q, impl="pallas_int8_pv")


def test_attention_with_lse_partials_merge_to_dense():
    """(out, lse2) over disjoint kv blocks must merge exactly to the dense
    softmax — the invariant ring attention is built on."""
    from smb_vision_tpu.ops.attention import attention_with_lse

    q, k, v = _qkv(jax.random.PRNGKey(3))
    o1, l1 = attention_with_lse(q, k[:, :96], v[:, :96], impl="pallas",
                                interpret=True, block_q=64, block_k=32)
    o2, l2 = attention_with_lse(q, k[:, 96:], v[:, 96:], impl="pallas",
                                interpret=True, block_q=64, block_k=32)
    m = jnp.maximum(l1, l2)
    w1, w2 = jnp.exp2(l1 - m), jnp.exp2(l2 - m)
    den = w1 + w2
    bw = lambda w: jnp.swapaxes((w / den)[..., None], 1, 2)  # noqa: E731
    merged = o1.astype(jnp.float32) * bw(w1) + o2.astype(jnp.float32) * bw(w2)
    ref = xla_attention(q, k, v)
    np.testing.assert_allclose(np.asarray(merged), np.asarray(ref),
                               atol=2e-6, rtol=2e-6)


def test_attention_with_lse_grads_through_both_outputs():
    """The lse2 cotangent folds into the backward's delta term — grads of a
    loss touching BOTH outputs must match the XLA reference."""
    from smb_vision_tpu.ops.attention import attention_with_lse

    q, k, v = _qkv(jax.random.PRNGKey(4))

    def loss(impl):
        def f(q, k, v):
            out, lse = attention_with_lse(
                q, k, v, impl=impl, interpret=impl == "pallas",
                block_q=64, block_k=32)
            # weight the lse term so its cotangent is non-trivial
            return (jnp.sum(out.astype(jnp.float32) ** 2)
                    + jnp.sum(jnp.sin(lse) * lse))
        return f

    g_pl = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    for a, b in zip(g_pl, g_ref):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-5,
                                   rtol=2e-5)


def test_i8bwd_forward_is_bf16_flash():
    # pallas_i8bwd changes ONLY the backward: forward must equal the
    # plain pallas forward exactly
    q, k, v = _qkv(jax.random.PRNGKey(7), n=128)
    a = attention(q, k, v, impl="pallas", interpret=True,
                  block_q=64, block_k=64)
    b = attention(q, k, v, impl="pallas_i8bwd", interpret=True,
                  block_q=64, block_k=64)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attention_with_lse_honours_i8bwd():
    """attn_impl='pallas_i8bwd' must survive `attention_with_lse` (the
    SP/ring path) rather than silently coercing to the bf16 backward
    (round-5 review): the forward stays the bf16 flash kernel bitwise,
    the grads stay in the int8-error class of XLA, and they are NOT the
    bf16 backward's grads."""
    from smb_vision_tpu.ops.attention import attention_with_lse

    q, k, v = _qkv(jax.random.PRNGKey(9))

    o_i8, l_i8 = attention_with_lse(q, k, v, impl="pallas_i8bwd",
                                    interpret=True, block_q=64,
                                    block_k=32)
    o_bf, l_bf = attention_with_lse(q, k, v, impl="pallas",
                                    interpret=True, block_q=64,
                                    block_k=32)
    np.testing.assert_array_equal(np.asarray(o_i8), np.asarray(o_bf))
    np.testing.assert_array_equal(np.asarray(l_i8), np.asarray(l_bf))

    def loss(impl):
        def f(q, k, v):
            out, lse = attention_with_lse(q, k, v, impl=impl,
                                          interpret=impl != "xla",
                                          block_q=64, block_k=32)
            return (jnp.sum(out.astype(jnp.float32) ** 2)
                    + jnp.sum(jnp.sin(lse) * lse))
        return f

    g_i8 = jax.grad(loss("pallas_i8bwd"), argnums=(0, 1, 2))(q, k, v)
    g_bf = jax.grad(loss("pallas"), argnums=(0, 1, 2))(q, k, v)
    g_ref = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
    coerced = all(np.array_equal(np.asarray(a), np.asarray(b))
                  for a, b in zip(g_i8, g_bf))
    assert not coerced, "i8bwd silently ran the bf16 backward"
    for a, b, name in zip(g_i8, g_ref, ["dq", "dk", "dv"]):
        a, b = np.asarray(a), np.asarray(b)
        assert np.isfinite(a).all(), name
        err = np.abs(a - b).max() / (np.abs(b).max() + 1e-6)
        assert err < 5e-2, (name, err)


def test_i8bwd_grads():
    """int8-score backward (round-5 VERDICT #2): dq/dk/dv within the
    int8-quantization error class of the XLA grads (~1% — per-head
    symmetric scales on s and dp), both aligned and ragged."""
    for n in (128, 100):
        q, k, v = _qkv(jax.random.PRNGKey(8), n=n)

        def loss(impl):
            def f(q, k, v):
                return jnp.sum(attention(q, k, v, impl=impl,
                                         interpret=True, block_q=64,
                                         block_k=64) ** 2)
            return f

        g_ref = jax.grad(loss("xla"), argnums=(0, 1, 2))(q, k, v)
        g_i8 = jax.grad(loss("pallas_i8bwd"), argnums=(0, 1, 2))(q, k, v)
        for a, b, name in zip(g_i8, g_ref, ["dq", "dk", "dv"]):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(a).all(), (name, n)
            scale = np.abs(b).max() + 1e-6
            err = np.abs(a - b).max() / scale
            assert err < 5e-2, (name, n, err)
