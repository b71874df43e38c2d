"""Mask-generator properties (mirrors the reference's transform tests,
tests/test_vjepa_transforms.py: coverage + disjointness assertions)."""

import jax
import jax.numpy as jnp
import numpy as np

from smb_vision_tpu.ops.masking import (
    mim_mask,
    mim_mask_counts,
    num_masked_tokens,
    vjepa_target_mask,
)


def test_mim_mask_exact_count():
    key = jax.random.PRNGKey(0)
    m = mim_mask(key, 4, input_size=64, depth=32, mask_patch_size=16,
                 model_patch_size=16, mask_ratio=0.6)
    tc, mc, scale = mim_mask_counts(64, 32, 16, 16, 0.6)
    assert scale == 1 and tc == 2 * 4 * 4
    assert m.shape == (4, tc)
    np.testing.assert_array_equal(np.asarray(m.sum(-1)), mc)


def test_mim_mask_upsampling_blocks():
    key = jax.random.PRNGKey(1)
    m = mim_mask(key, 2, input_size=64, depth=64, mask_patch_size=32,
                 model_patch_size=16, mask_ratio=0.5)
    # coarse 2x2x2 grid, scale 2 -> fine grid 4x4x4
    assert m.shape == (2, 64)
    assert num_masked_tokens(64, 64, 32, 16, 0.5) == 4 * 8
    fine = np.asarray(m).reshape(2, 4, 4, 4)
    # every 2x2x2 fine block must be constant (upsampled from one coarse cell)
    for i in range(2):
        for a in range(2):
            for b in range(2):
                for c in range(2):
                    blk = fine[i, 2*a:2*a+2, 2*b:2*b+2, 2*c:2*c+2]
                    assert blk.min() == blk.max()


def test_mim_mask_per_sample_distinct():
    m = mim_mask(jax.random.PRNGKey(2), 8, input_size=96, depth=96,
                 mask_patch_size=16, model_patch_size=16, mask_ratio=0.5)
    m = np.asarray(m)
    assert any(not np.array_equal(m[0], m[i]) for i in range(1, 8))


def test_vjepa_mask_properties():
    grid = (8, 8, 8)
    tb = vjepa_target_mask(jax.random.PRNGKey(3), 6, grid=grid, num_blocks=3)
    assert tb.shape == (6, 512)
    frac = np.asarray(tb.mean(axis=-1))
    # target = union of up to 3 blocks each ~<= (1-0.2)=0.8 of volume
    assert (frac > 0).all() and (frac < 1).all()
    # context/target partition the grid by construction (complement)
    ctx = ~np.asarray(tb)
    assert ((ctx | np.asarray(tb)).all())
    assert not (ctx & np.asarray(tb)).any()


def test_vjepa_mask_blocks_are_rectangular():
    # with one block, the target region projected on each axis is contiguous
    grid = (6, 6, 6)
    tb = vjepa_target_mask(jax.random.PRNGKey(4), 4, grid=grid, num_blocks=1)
    vols = np.asarray(tb).reshape(4, *grid)
    for v in vols:
        for ax in range(3):
            proj = v.any(axis=tuple(i for i in range(3) if i != ax))
            idx = np.nonzero(proj)[0]
            assert len(idx) > 0
            assert (np.diff(idx) == 1).all()


def test_vjepa_mask_per_sample_distinct():
    tb = vjepa_target_mask(jax.random.PRNGKey(5), 8, grid=(8, 8, 8),
                           num_blocks=3)
    tb = np.asarray(tb)
    assert any(not np.array_equal(tb[0], tb[i]) for i in range(1, 8))


def test_mask_ratio_out_of_range_raises():
    """mask_ratio > 1 would over-report num_masked_tokens while mim_mask
    clamps — the exact-static-count contract requires a hard error."""
    import pytest

    from smb_vision_tpu.ops.masking import num_masked_tokens

    with pytest.raises(ValueError, match="mask_ratio"):
        num_masked_tokens(32, 32, 16, 16, 1.2)
    with pytest.raises(ValueError, match="mask_ratio"):
        num_masked_tokens(32, 32, 16, 16, 0.0)


def test_vjepa_mask_option_parity():
    """VJEPAMaskGenerator's full_complement / pred_full_complement /
    max_keep switches (reference transforms.py:109-217)."""
    import pytest

    from smb_vision_tpu.ops.masking import mask_to_indices

    grid = (4, 4, 4)
    key = jax.random.PRNGKey(7)
    base = vjepa_target_mask(key, 3, grid=grid, num_blocks=2)

    # full_complement / pred_full_complement hold by construction in the
    # dense form: accepting them must not change the mask
    fc = vjepa_target_mask(key, 3, grid=grid, num_blocks=2,
                           full_complement=True)
    pfc = vjepa_target_mask(key, 3, grid=grid, num_blocks=2,
                            pred_full_complement=True)
    np.testing.assert_array_equal(np.asarray(base), np.asarray(fc))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(pfc))

    # max_keep creates a third 'dropped' token state -> dense form rejects
    with pytest.raises(ValueError, match="max_keep"):
        vjepa_target_mask(key, 3, grid=grid, num_blocks=2, max_keep=8)

    # ... and the index-list form implements it exactly like the reference
    # (transforms.py:207-209): both lists truncated to their first k
    # entries in ascending token order
    row = np.asarray(base)[0]
    ctx_full, tgt_full = mask_to_indices(row)
    assert (np.diff(ctx_full) > 0).all() and (np.diff(tgt_full) > 0).all()
    np.testing.assert_array_equal(np.sort(np.concatenate([ctx_full,
                                                          tgt_full])),
                                  np.arange(row.size))
    k = 5
    ctx_k, tgt_k = mask_to_indices(row, max_keep=k)
    np.testing.assert_array_equal(ctx_k, ctx_full[:k])
    np.testing.assert_array_equal(tgt_k, tgt_full[:k])
    # flags are accepted (and no-ops) on the index form too
    ctx_f, tgt_f = mask_to_indices(row, full_complement=True,
                                   pred_full_complement=True)
    np.testing.assert_array_equal(ctx_f, ctx_full)
    np.testing.assert_array_equal(tgt_f, tgt_full)
    # pre-round-5 alias
    ctx_a, tgt_a = mask_to_indices(row, max_len=k)
    np.testing.assert_array_equal(ctx_a, ctx_k)
    np.testing.assert_array_equal(tgt_a, tgt_k)


def test_reference_full_complement_branch_is_unreachable_evidence():
    """Documents why full_complement is a no-op here: the reference's own
    branch (transforms.py:198-204) calls torch.tensor(set(...)), which
    raises — i.e. the option never produced a different mask upstream."""
    import pytest
    import torch

    with pytest.raises(TypeError):
        torch.tensor(set(range(8)) - {1, 2}, dtype=torch.int64)
