"""Sliding-window inference/embedding over arbitrary-size volumes.

TPU-native rework of the reference's vendored MONAI engine
(/root/reference/src/inference.py:43-322 `sliding_window_inference`,
:325-438 `sliding_window_embed`):

- dense overlapping 3D windows with the same scan-interval math
  (interval = roi * (1-overlap), clipped; final window snapped inside)
- gaussian / constant importance-map blending
- every window has the SAME static shape -> one jit-compiled window batch
  function, windows processed in fixed-size batches via dynamic_slice

`sliding_window_embed` returns per-window embeddings (B, num_windows, L, D)
or mean-pooled (B, num_windows, D) plus window start coordinates. (The
reference's version was unwired and its importance-weighted accumulation
never ran with consistent shapes; this is the working equivalent of its
documented contract: "accumulates per-window embeddings weighted by
importance map, normalised by count map".)
"""

from __future__ import annotations

import itertools
import math
from typing import Callable, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np


def scan_interval(image_size: Sequence[int], roi_size: Sequence[int],
                  overlap: Sequence[float] | float) -> Tuple[int, ...]:
    """interval = roi * (1 - overlap) per dim; 0 (single position) when the
    roi covers the whole dim (matches _get_scan_interval,
    reference inference.py:480-497)."""
    if not isinstance(overlap, (tuple, list)):
        overlap = [overlap] * len(roi_size)
    out = []
    for im, roi, ov in zip(image_size, roi_size, overlap):
        if roi == im:
            out.append(im)
        else:
            out.append(max(int(roi * (1 - ov)), 1))
    return tuple(out)


def dense_window_starts(image_size: Sequence[int], roi_size: Sequence[int],
                        interval: Sequence[int]) -> np.ndarray:
    """Start coordinates of all windows (num_windows, ndim); the last
    window of each dim is clamped so it stays inside the volume (MONAI
    dense_patch_slices semantics)."""
    per_dim = []
    for im, roi, iv in zip(image_size, roi_size, interval):
        n = max(int(math.ceil((im - roi) / iv)) + 1, 1) if iv else 1
        starts = [min(i * iv, im - roi) for i in range(n)]
        # dedupe while preserving order (clamping can collide)
        seen, uniq = set(), []
        for s in starts:
            if s not in seen:
                seen.add(s)
                uniq.append(s)
        per_dim.append(uniq)
    return np.array(list(itertools.product(*per_dim)), dtype=np.int32)


def importance_map(roi_size: Sequence[int], mode: str = "constant",
                   sigma_scale: float = 0.125) -> jnp.ndarray:
    """Blending weights per voxel of a window (constant ones or a centred
    gaussian, sigma = sigma_scale * dim)."""
    if mode == "constant":
        return jnp.ones(tuple(roi_size), jnp.float32)
    if mode != "gaussian":
        raise ValueError(f"unknown blend mode {mode}")
    grids = []
    for d in roi_size:
        center = (d - 1) / 2.0
        sigma = max(d * sigma_scale, 1e-3)
        x = (np.arange(d) - center) / sigma
        grids.append(np.exp(-0.5 * x * x))
    out = np.einsum("i,j,k->ijk", *grids).astype(np.float32)
    out = np.maximum(out, out.max() * 1e-3)
    return jnp.asarray(out)


def _pad_to_min(volume: jnp.ndarray, roi_size, cval: float):
    """Symmetric pad so every spatial dim >= roi (reference :377-384)."""
    spatial = volume.shape[2:]
    pads = [(0, 0), (0, 0)]
    for cur, roi in zip(spatial, roi_size):
        extra = max(roi - cur, 0)
        pads.append((extra // 2, extra - extra // 2))
    if any(p != (0, 0) for p in pads):
        volume = jnp.pad(volume, pads, constant_values=cval)
    return volume


def token_weights(roi_size: Sequence[int], num_tokens: int,
                  mode: str = "constant", sigma_scale: float = 0.125,
                  token_grid: Optional[Sequence[int]] = None) -> jnp.ndarray:
    """Per-token blending weights (L,): the voxel importance map average-
    pooled over each token's patch. Tokens are assumed to tile the roi on a
    regular grid (patch embed); the grid is inferred from num_tokens when
    every axis shares the same patch size, else pass token_grid."""
    if mode == "constant":
        return jnp.ones((num_tokens,), jnp.float32)
    if token_grid is None:
        # infer a cubic patch: p such that prod(roi/p) == num_tokens
        vox_per_token = int(np.prod(roi_size)) / num_tokens
        p = round(vox_per_token ** (1 / 3))
        grid = [r // p for r in roi_size]
        if (p <= 0 or any(r % p for r in roi_size)
                or int(np.prod(grid)) != num_tokens):
            raise ValueError(
                f"cannot infer a regular token grid for roi {tuple(roi_size)}"
                f" with {num_tokens} tokens; pass token_grid=(th, tw, td)")
        token_grid = grid
    imap = np.asarray(importance_map(roi_size, mode, sigma_scale))
    th, tw, td = token_grid
    ph, pw, pd = (roi_size[0] // th, roi_size[1] // tw, roi_size[2] // td)
    w = imap.reshape(th, ph, tw, pw, td, pd).mean(axis=(1, 3, 5))
    return jnp.asarray(w.reshape(-1), jnp.float32)


def sliding_window_embed(volume: jnp.ndarray, roi_size: Sequence[int],
                         embedder: Callable[[jnp.ndarray], jnp.ndarray],
                         *, overlap: float = 0.25, sw_batch_size: int = 1,
                         mode: str = "constant", sigma_scale: float = 0.125,
                         cval: float = 0.0, pool: bool = False,
                         token_grid: Optional[Sequence[int]] = None):
    """volume: (B, C, H, W, D). embedder: (N, C, *roi) -> (N, L, D).

    Returns (embeddings, starts):
      embeddings: (B, num_windows, L, D)   [or (B, num_windows, D) if pool]
      starts:     (num_windows, 3) window start coords in the padded volume

    mode="gaussian" applies the reference's importance weighting
    (/root/reference/src/inference.py:325-438) at token granularity: each
    token is weighted by the mean gaussian weight of the voxels it covers
    (token_weights). With pool=True the window embedding becomes the
    weighted mean over tokens (centre tokens dominate); without pooling the
    tokens are scaled mean-preservingly (weights normalised to mean 1).
    mode="constant" is exact passthrough."""
    b = volume.shape[0]
    volume = _pad_to_min(volume, roi_size, cval)
    spatial = volume.shape[2:]
    interval = scan_interval(spatial, roi_size, overlap)
    starts = dense_window_starts(spatial, roi_size, interval)
    n_win = len(starts)

    starts_dev = jnp.asarray(starts)

    def get_window(vol, s):
        return jax.lax.dynamic_slice(
            vol, (0, 0, s[0], s[1], s[2]),
            (vol.shape[0], vol.shape[1], *roi_size))

    @jax.jit
    def run_batch(vol, batch_starts):
        wins = jax.vmap(lambda s: get_window(vol, s))(batch_starts)
        # (nw, B, C, *roi) -> (nw*B, C, *roi)
        nw = wins.shape[0]
        flat = wins.reshape((nw * vol.shape[0],) + wins.shape[2:])
        emb = embedder(flat)                      # (nw*B, L, D)
        return emb.reshape(nw, vol.shape[0], *emb.shape[1:])

    outs = []
    for i in range(0, n_win, sw_batch_size):
        chunk = starts_dev[i:i + sw_batch_size]
        if chunk.shape[0] < sw_batch_size:  # pad batch to static size
            pad = sw_batch_size - chunk.shape[0]
            chunk = jnp.concatenate([chunk, jnp.tile(chunk[-1:], (pad, 1))])
            out = run_batch(volume, chunk)[:sw_batch_size - pad]
        else:
            out = run_batch(volume, chunk)
        outs.append(out)
    emb = jnp.concatenate(outs, axis=0)           # (n_win, B, L, D)
    emb = jnp.swapaxes(emb, 0, 1)                 # (B, n_win, L, D)
    if mode == "constant":
        return (emb.mean(axis=2) if pool else emb), starts
    w = token_weights(roi_size, emb.shape[2], mode, sigma_scale, token_grid)
    if pool:
        emb = jnp.einsum("bwld,l->bwd", emb, w / jnp.sum(w))
    else:
        emb = emb * (w / jnp.mean(w))[None, None, :, None]
    return emb, starts


def sliding_window_inference(volume: jnp.ndarray, roi_size: Sequence[int],
                             predictor: Callable[[jnp.ndarray], jnp.ndarray],
                             *, overlap: float = 0.25,
                             sw_batch_size: int = 1,
                             mode: str = "constant",
                             sigma_scale: float = 0.125,
                             cval: float = 0.0) -> jnp.ndarray:
    """Dense voxel-space variant: predictor maps (N, C, *roi) ->
    (N, C', *roi); overlapping windows are blended with the importance map
    and normalised by the accumulated count map, then cropped back to the
    input spatial size."""
    b, _c = volume.shape[:2]
    orig_spatial = volume.shape[2:]
    volume = _pad_to_min(volume, roi_size, cval)
    spatial = volume.shape[2:]
    interval = scan_interval(spatial, roi_size, overlap)
    starts = dense_window_starts(spatial, roi_size, interval)
    imap = importance_map(roi_size, mode, sigma_scale)

    probe = predictor(jnp.zeros((1, volume.shape[1], *roi_size),
                                volume.dtype))
    c_out = probe.shape[1]
    out = jnp.zeros((b, c_out, *spatial), jnp.float32)
    cnt = jnp.zeros((1, 1, *spatial), jnp.float32)

    @jax.jit
    def accumulate(out, cnt, vol, s):
        win = jax.lax.dynamic_slice(
            vol, (0, 0, s[0], s[1], s[2]), (b, vol.shape[1], *roi_size))
        pred = predictor(win).astype(jnp.float32) * imap
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(
                out, (0, 0, s[0], s[1], s[2]),
                (b, c_out, *roi_size)) + pred,
            (0, 0, s[0], s[1], s[2]))
        cnt = jax.lax.dynamic_update_slice(
            cnt, jax.lax.dynamic_slice(
                cnt, (0, 0, s[0], s[1], s[2]), (1, 1, *roi_size))
            + imap[None, None],
            (0, 0, s[0], s[1], s[2]))
        return out, cnt

    starts_dev = jnp.asarray(starts)
    for i in range(len(starts)):
        out, cnt = accumulate(out, cnt, volume, starts_dev[i])
    out = out / (cnt + 1e-8)

    # crop padding back off
    crops = []
    for cur, orig in zip(spatial, orig_spatial):
        start = (cur - orig) // 2
        crops.append(slice(start, start + orig))
    return out[(slice(None), slice(None), *crops)]
