"""Weight serialization: flax param pytrees <-> flat safetensors files.

Gives HF-hub-compatible weight export (the reference publishes safetensors
via upload_model.py:6-23) and is the substrate for converting published
checkpoints (standardmodelbio/smb-vision-base*, facebook/vjepa2*) into this
framework (models/convert.py)."""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np


def flatten_params(params, sep: str = ".") -> Dict[str, np.ndarray]:
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        key = sep.join(str(getattr(p, "key", getattr(p, "idx", p)))
                       for p in path)
        flat[key] = np.asarray(leaf)
    return flat


def unflatten_params(flat: Dict[str, np.ndarray], sep: str = "."):
    tree: dict = {}
    for key, val in flat.items():
        parts = key.split(sep)
        node = tree
        for i, p in enumerate(parts[:-1]):
            node = node.setdefault(p, {})
            if not isinstance(node, dict):
                # foreign checkpoints can carry both "head" and
                # "head.bias" — insertion order would silently decide
                # which survives; refuse the ambiguity instead
                raise ValueError(
                    f"ambiguous flat keys: {sep.join(parts[:i + 1])!r} is "
                    f"both a tensor and a prefix of {key!r}")
        if isinstance(node.get(parts[-1]), dict):
            raise ValueError(
                f"ambiguous flat keys: {key!r} is both a tensor and a "
                "prefix of other keys")
        node[parts[-1]] = val
    return tree


def save_params_safetensors(params, path) -> None:
    from safetensors.numpy import save_file

    flat = flatten_params(params)
    save_file(flat, str(path))


def load_params_safetensors(path):
    from safetensors.numpy import load_file

    return unflatten_params(load_file(str(path)))


def load_params_into(params, path, sep: str = "."):
    """Graft a flat safetensors checkpoint into an existing params tree.

    Leaves whose flat key AND shape match are replaced by the checkpoint
    value (cast to the existing leaf's dtype); everything else keeps its
    initialisation. Supports continued pretraining from a partial
    checkpoint — e.g. loading an encoder-only export into a V-JEPA state
    whose predictor stays freshly initialised.

    Returns (new_params, loaded_keys, skipped_ckpt_keys) where
    skipped_ckpt_keys are checkpoint entries with no matching leaf (or a
    shape mismatch) in `params`.
    """
    from safetensors.numpy import load_file

    import jax.numpy as jnp

    ckpt = load_file(str(path))
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    loaded, out = [], []
    for p, leaf in flat:
        key = sep.join(str(getattr(q, "key", getattr(q, "idx", q)))
                       for q in p)
        val = ckpt.get(key)
        if val is not None and tuple(val.shape) == tuple(leaf.shape):
            out.append(jnp.asarray(val, dtype=leaf.dtype))
            loaded.append(key)
        else:
            out.append(leaf)
    skipped = sorted(set(ckpt) - set(loaded))
    return (jax.tree_util.tree_unflatten(treedef, out), loaded, skipped)
