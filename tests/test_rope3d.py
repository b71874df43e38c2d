"""3D RoPE numerics vs an independent torch re-derivation of the reference
formulas (modeling_vjepa.py:204-228,262-326)."""

import jax.numpy as jnp
import numpy as np
import torch

from smb_vision_tpu.ops.rope3d import (
    apply_rope3d,
    position_ids_3d,
    rope3d_cos_sin,
    rope_axis_dims,
)


def _torch_rotate(x, pos):
    """Reference rotate_queries_or_keys: x (B,H,N,D), pos (N,) or (B,H,N)."""
    B, H, N, D = x.shape
    omega = torch.arange(D // 2, dtype=x.dtype) / (D / 2.0)
    omega = 1.0 / 10000**omega
    freq = torch.einsum("..., f -> ... f", pos.to(x.dtype), omega)
    if freq.dim() == 2:  # (N, D/2) -> broadcast to (B,H,N,D/2)
        freq = freq.expand(B, H, N, D // 2)
    emb_sin = freq.sin().repeat(1, 1, 1, 2)
    emb_cos = freq.cos().repeat(1, 1, 1, 2)
    y = x.unflatten(-1, (-1, 2))
    y1, y2 = y.unbind(dim=-1)
    y = torch.stack((-y2, y1), dim=-1).flatten(-2)
    return (x * emb_cos) + (y * emb_sin)


def _torch_apply_full(x, ids, grid_hw, head_dim):
    d_dim, h_dim, w_dim, rem = rope_axis_dims(head_dim)
    tpf = grid_hw * grid_hw
    frame = ids // tpf
    height = (ids - tpf * frame) // grid_hw
    width = ids - tpf * frame - grid_hw * height
    s = 0
    parts = []
    for p, dim in ((frame, d_dim), (height, h_dim), (width, w_dim)):
        parts.append(_torch_rotate(x[..., s:s + dim], p))
        s += dim
    if rem:
        parts.append(x[..., s:])
    return torch.cat(parts, dim=-1)


def test_position_decomposition():
    ids = jnp.arange(4 * 3 * 3)
    f, h, w = position_ids_3d(ids, grid_hw=3)
    assert int(f[0]) == 0 and int(f[-1]) == 3
    idx = 1 * 9 + 2 * 3 + 1  # frame 1, row 2, col 1 -> flat 16
    assert int(f[idx]) == 1 and int(h[idx]) == 2 and int(w[idx]) == 1


def test_matches_reference_formula():
    torch.manual_seed(0)
    B, H, N, D = 2, 4, 36, 64
    grid_hw = 3  # frames = 4
    xt = torch.randn(B, H, N, D)
    ids_t = torch.arange(N)
    ref = _torch_apply_full(xt, ids_t, grid_hw, D).numpy()

    x = jnp.asarray(xt.numpy()).transpose(0, 2, 1, 3)  # (B,N,H,D)
    cos, sin = rope3d_cos_sin(jnp.arange(N), grid_hw, D)
    out = apply_rope3d(x, cos, sin).transpose(0, 2, 1, 3)
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-5, rtol=1e-5)


def test_remainder_dims_untouched():
    # head_dim=50 -> 3*16 rotated + 2 remainder passthrough
    B, N, H, D = 1, 9, 1, 50
    x = jnp.ones((B, N, H, D))
    cos, sin = rope3d_cos_sin(jnp.arange(N), 3, D)
    out = apply_rope3d(x, cos, sin)
    np.testing.assert_allclose(np.asarray(out[..., 48:]), 1.0, atol=1e-7)


def test_identity_at_origin():
    # token 0 has all-zero positions -> cos=1, sin=0 -> identity
    import jax
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 27, 2, 48))
    cos, sin = rope3d_cos_sin(jnp.arange(27), 3, 48)
    out = apply_rope3d(x, cos, sin)
    np.testing.assert_allclose(np.asarray(out[:, 0]), np.asarray(x[:, 0]),
                               atol=1e-6)
