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
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = val
    return tree


def save_params_safetensors(params, path) -> None:
    from safetensors.numpy import save_file

    flat = flatten_params(params)
    save_file(flat, str(path))


def load_params_safetensors(path):
    from safetensors.numpy import load_file

    return unflatten_params(load_file(str(path)))
