"""Checkpoint conversion and backbone grafting.

- `load_backbone_into`: initialise a fine-tune model from a pretraining
  checkpoint (this framework's safetensors export) by copying every
  name+shape-matching subtree — the from_pretrained path of
  run_classification.py:481-504.
- `convert_hf_videomae` / `convert_hf_vjepa2`: map HuggingFace torch
  checkpoints (e.g. standardmodelbio/smb-vision-base, facebook/vjepa2-*)
  into this framework's param pytrees, so published weights carry over.
  Torch Linear stores (out, in); flax Dense kernels are (in, out) -> maps
  transpose. Conv3d kernels keep the HF layout (our patch_embed consumes
  (out, in, kt, kh, kw) directly, ops/patches.py).
- `resolve_checkpoint_source` / `convert_hf_auto`: hub interop — an
  'org/name' repo id downloads via huggingface_hub (gated import) and
  HF-schema checkpoints are family-detected and converted, so
  `--model_name_or_path standardmodelbio/smb-vision-base-20250122` works
  like the reference's from_pretrained (run_inference.py:70).
"""

from __future__ import annotations

from typing import Dict, Optional

import numpy as np

from smb_vision_tpu.utils.logging import get_logger
from smb_vision_tpu.utils.serialization import (
    flatten_params,
    load_params_safetensors,
    unflatten_params,
)

logger = get_logger(__name__)


_WRAPPER_PREFIXES = ("videomae.", "vjepa2.", "dinov2.")


def _name_variants(key: str):
    """A checkpoint saved from a head model nests the backbone under a
    wrapper module (e.g. params.videomae.encoder...) while the bare encoder
    model does not — match across that difference both ways."""
    yield key
    for w in _WRAPPER_PREFIXES:
        tag = "params." + w
        if key.startswith(tag):
            yield "params." + key[len(tag):]
        elif key.startswith("params."):
            yield tag + key[len("params."):]


def resolve_checkpoint_source(name_or_path: str) -> str:
    """Local path passthrough; an 'org/name' HuggingFace hub repo id
    downloads to the local HF cache and resolves to the snapshot
    directory (the reference pulls published checkpoints straight from
    the hub, run_inference.py:70 `from_pretrained("standardmodelbio/
    smb-vision-base-20250122")`). huggingface_hub is a gated import —
    zero-egress environments get an actionable error instead of a
    network hang."""
    import os
    import re

    if os.path.exists(name_or_path):
        return name_or_path
    # a checkpoint-file suffix means a local path that is simply missing
    # — never reroute it to a (network-hanging, in zero-egress envs) hub
    # lookup; repo ids are bare 'org/name'
    looks_like_file = name_or_path.endswith(
        (".safetensors", ".bin", ".pt", ".pth", ".json"))
    if (not looks_like_file
            and re.fullmatch(r"[\w.\-]+/[\w.\-]+", name_or_path)):
        try:
            from huggingface_hub import snapshot_download
        except ImportError as e:
            raise ImportError(
                f"'{name_or_path}' is not a local path; to pull it as a "
                "HuggingFace hub repo id install huggingface_hub "
                "(pip install huggingface_hub), or pass a local "
                "checkpoint path") from e
        logger.info("downloading hub checkpoint %s", name_or_path)
        try:
            return snapshot_download(
                name_or_path,
                allow_patterns=["*.safetensors", "*.bin", "*.json"])
        except Exception as e:
            raise FileNotFoundError(
                f"{name_or_path}: no such local path, and resolving it "
                f"as a hub repo id failed ({type(e).__name__}: {e})"
            ) from e
    raise FileNotFoundError(
        f"{name_or_path}: not a local path and not an 'org/name' hub "
        "repo id")


def _layer_count(flat: Dict[str, np.ndarray], pattern: str) -> int:
    import re

    rx = re.compile(pattern)
    idx = [int(m.group(1)) for k in flat for m in [rx.search(k)] if m]
    return 1 + max(idx) if idx else 0


def convert_hf_auto(flat: Dict[str, np.ndarray]) -> Dict:
    """Detect the model family of a flat HF torch state dict by its key
    schema and dispatch to the matching convert_hf_* with inferred layer
    counts — the autoload path behind hub repo ids (load_backbone_into)."""
    keys = flat.keys()
    has = lambda frag: any(frag in k for k in keys)  # noqa: E731
    if (has("predictor.") or has("patch_embeddings.proj.")
            or has("patch_embeddings.proj_3d.")):
        return convert_hf_vjepa2(
            flat, _layer_count(flat, r"encoder\.layer\.(\d+)\."),
            _layer_count(flat, r"predictor\.layer\.(\d+)\."))
    if has("vision_model.") or has("embeddings.patch_embedding.weight"):
        return convert_hf_siglip(
            flat, _layer_count(flat, r"encoder\.layers?\.(\d+)\."))
    if has("embeddings.cls_token"):
        n = _layer_count(flat, r"encoder\.layer\.(\d+)\.")
        proj = next((k for k in keys
                     if k.endswith("patch_embeddings.projection.weight")),
                    None)
        if proj is not None and flat[proj].ndim == 4:
            raise ValueError(
                "2D DINOv2 checkpoint: depth inflation needs the target "
                "geometry — call convert_hf_dinov2(flat, num_layers, "
                "depth_patch=..., depth_grid=...) directly")
        return convert_hf_dinov2(flat, n)
    if has("embeddings.patch_embeddings.projection.weight"):
        return convert_hf_videomae(
            flat, _layer_count(flat, r"encoder\.layer\.(\d+)\."),
            _layer_count(flat, r"decoder\.decoder_layers\.(\d+)\."))
    raise ValueError(
        "unrecognised HF checkpoint schema (no VideoMAE/VJEPA2/DINOv2/"
        f"SigLIP markers; first keys: {list(keys)[:3]})")


def _peek_flat_keys(path: str):
    """Key names of a checkpoint file without materialising tensors
    (safetensors header read; torch .bin falls back to a full load)."""
    from pathlib import Path

    p = Path(path)
    if p.suffix == ".safetensors":
        from safetensors import safe_open

        with safe_open(str(p), framework="numpy") as f:
            return list(f.keys())
    return list(load_hf_checkpoint_numpy(str(p)).keys())


def load_backbone_into(params, checkpoint_path: str, *,
                       require_match: bool = True):
    """Copy every param from `checkpoint_path` whose (wrapper-normalised)
    flattened name and shape match into `params`.

    checkpoint_path may be: this framework's safetensors export (file),
    an HF checkpoint file/directory (torch key schema — converted via
    convert_hf_auto), or an 'org/name' hub repo id (downloaded first,
    resolve_checkpoint_source)."""
    from pathlib import Path

    checkpoint_path = resolve_checkpoint_source(checkpoint_path)
    target = flatten_params(params)
    p = Path(checkpoint_path)
    if not p.is_dir() and p.suffix == ".safetensors" and any(
            k.startswith("params.") for k in _peek_flat_keys(p)):
        # our export: the header peek decides without materialising
        source = flatten_params(load_params_safetensors(checkpoint_path))
    else:
        # directory or torch .bin/.pt: one full load, branch on its keys
        # (a header-only peek is impossible for torch pickles — peeking
        # then reloading would deserialize a multi-GB checkpoint twice)
        flat = load_hf_checkpoint_numpy(checkpoint_path)
        if any(k.startswith("params.") for k in flat):
            source = flat           # our export, sharded/dir layout
        else:
            source = flatten_params(convert_hf_auto(flat))
    loaded, skipped = 0, []
    for k, v in source.items():
        hit = None
        for cand in _name_variants(k):
            if cand in target and target[cand].shape == v.shape:
                hit = cand
                break
        if hit is not None:
            target[hit] = v.astype(target[hit].dtype)
            loaded += 1
        else:
            skipped.append(k)
    logger.info("grafted %d/%d tensors from %s (%d source unmatched)",
                loaded, len(target), checkpoint_path, len(skipped))
    if require_match and loaded == 0:
        raise ValueError(
            f"no tensors from {checkpoint_path} matched the target model "
            f"(first source keys: {list(source)[:3]}; "
            f"first target keys: {list(target)[:3]})")
    return unflatten_params(target)


# ---------------------------------------------------------------------------
# HuggingFace torch checkpoint -> flax pytree
# ---------------------------------------------------------------------------

def _t(x):  # torch Linear weight -> flax Dense kernel
    return np.ascontiguousarray(np.asarray(x).T)


def _block_map(flat: Dict[str, np.ndarray], hf_prefix: str, layer: int,
               out: Dict[str, np.ndarray], our_prefix: str,
               hf_style: str) -> None:
    """Map one transformer block. hf_style:
    'videomae' — attention.attention.{query,key,value}, output.dense,
                  intermediate.dense / output.dense, layernorm_before/after
    'vjepa'    — attention.{query,key,value,proj}, mlp.fc1/fc2, norm1/norm2
    'siglip'   — self_attn.{q,k,v,out}_proj, mlp.fc1/fc2, layer_norm1/2
    """
    p = f"{hf_prefix}.{layer}."
    o = f"{our_prefix}.layer_{layer}."
    if hf_style == "videomae":
        pairs = [
            (p + "attention.attention.query.weight", o + "attention.query.kernel", _t),
            (p + "attention.attention.key.weight", o + "attention.key.kernel", _t),
            (p + "attention.attention.value.weight", o + "attention.value.kernel", _t),
            (p + "attention.attention.q_bias", o + "attention.query.bias", np.asarray),
            (p + "attention.attention.v_bias", o + "attention.value.bias", np.asarray),
            (p + "attention.output.dense.weight", o + "attention.proj.kernel", _t),
            (p + "attention.output.dense.bias", o + "attention.proj.bias", np.asarray),
            (p + "intermediate.dense.weight", o + "mlp.fc1.kernel", _t),
            (p + "intermediate.dense.bias", o + "mlp.fc1.bias", np.asarray),
            (p + "output.dense.weight", o + "mlp.fc2.kernel", _t),
            (p + "output.dense.bias", o + "mlp.fc2.bias", np.asarray),
            (p + "layernorm_before.weight", o + "norm1.scale", np.asarray),
            (p + "layernorm_before.bias", o + "norm1.bias", np.asarray),
            (p + "layernorm_after.weight", o + "norm2.scale", np.asarray),
            (p + "layernorm_after.bias", o + "norm2.bias", np.asarray),
        ]
    elif hf_style == "siglip":
        pairs = [
            (p + "self_attn.q_proj.weight", o + "attention.query.kernel", _t),
            (p + "self_attn.q_proj.bias", o + "attention.query.bias", np.asarray),
            (p + "self_attn.k_proj.weight", o + "attention.key.kernel", _t),
            (p + "self_attn.k_proj.bias", o + "attention.key.bias", np.asarray),
            (p + "self_attn.v_proj.weight", o + "attention.value.kernel", _t),
            (p + "self_attn.v_proj.bias", o + "attention.value.bias", np.asarray),
            (p + "self_attn.out_proj.weight", o + "attention.proj.kernel", _t),
            (p + "self_attn.out_proj.bias", o + "attention.proj.bias", np.asarray),
            (p + "mlp.fc1.weight", o + "mlp.fc1.kernel", _t),
            (p + "mlp.fc1.bias", o + "mlp.fc1.bias", np.asarray),
            (p + "mlp.fc2.weight", o + "mlp.fc2.kernel", _t),
            (p + "mlp.fc2.bias", o + "mlp.fc2.bias", np.asarray),
            (p + "layer_norm1.weight", o + "norm1.scale", np.asarray),
            (p + "layer_norm1.bias", o + "norm1.bias", np.asarray),
            (p + "layer_norm2.weight", o + "norm2.scale", np.asarray),
            (p + "layer_norm2.bias", o + "norm2.bias", np.asarray),
        ]
    else:  # vjepa
        pairs = [
            (p + "attention.query.weight", o + "attention.query.kernel", _t),
            (p + "attention.query.bias", o + "attention.query.bias", np.asarray),
            (p + "attention.key.weight", o + "attention.key.kernel", _t),
            (p + "attention.key.bias", o + "attention.key.bias", np.asarray),
            (p + "attention.value.weight", o + "attention.value.kernel", _t),
            (p + "attention.value.bias", o + "attention.value.bias", np.asarray),
            (p + "attention.proj.weight", o + "attention.proj.kernel", _t),
            (p + "attention.proj.bias", o + "attention.proj.bias", np.asarray),
            (p + "mlp.fc1.weight", o + "mlp.fc1.kernel", _t),
            (p + "mlp.fc1.bias", o + "mlp.fc1.bias", np.asarray),
            (p + "mlp.fc2.weight", o + "mlp.fc2.kernel", _t),
            (p + "mlp.fc2.bias", o + "mlp.fc2.bias", np.asarray),
            (p + "norm1.weight", o + "norm1.scale", np.asarray),
            (p + "norm1.bias", o + "norm1.bias", np.asarray),
            (p + "norm2.weight", o + "norm2.scale", np.asarray),
            (p + "norm2.bias", o + "norm2.bias", np.asarray),
        ]
    for src, dst, fn in pairs:
        if src in flat:
            out[dst] = fn(flat[src])


def convert_hf_videomae(hf_state: Dict[str, np.ndarray], num_layers: int,
                        decoder_layers: int = 0) -> Dict:
    """hf_state: flat dict of numpy arrays from an HF VideoMAE checkpoint
    (torch .bin/.safetensors already loaded to numpy). Returns a params
    pytree for VideoMAEForPreTraining / ...ForVideoClassification."""
    out: Dict[str, np.ndarray] = {}
    f = hf_state

    def put(src, dst, fn=np.asarray):
        if src in f:
            out[dst] = fn(f[src])

    base = "videomae." if any(k.startswith("videomae.") for k in f) else ""
    put(base + "embeddings.patch_embeddings.projection.weight",
        "params.videomae.patch_embed_kernel")
    put(base + "embeddings.patch_embeddings.projection.bias",
        "params.videomae.patch_embed_bias")
    for i in range(num_layers):
        _block_map(f, base + "encoder.layer", i, out,
                   "params.videomae.encoder", "videomae")
    put(base + "layernorm.weight", "params.videomae.layernorm.scale")
    put(base + "layernorm.bias", "params.videomae.layernorm.bias")

    # pretraining head
    put("encoder_to_decoder.weight", "params.encoder_to_decoder.kernel", _t)
    put("mask_token", "params.mask_token")
    for i in range(decoder_layers):
        _block_map(f, "decoder.decoder_layers", i, out, "params.decoder",
                   "videomae")
    put("decoder.norm.weight", "params.decoder_norm.scale")
    put("decoder.norm.bias", "params.decoder_norm.bias")
    put("decoder.head.weight", "params.decoder_head.kernel", _t)
    put("decoder.head.bias", "params.decoder_head.bias")

    # classification head
    put("fc_norm.weight", "params.fc_norm.scale")
    put("fc_norm.bias", "params.fc_norm.bias")
    put("classifier.weight", "params.classifier.kernel", _t)
    put("classifier.bias", "params.classifier.bias")
    return unflatten_params(out)


def convert_hf_vjepa2(hf_state: Dict[str, np.ndarray], num_layers: int,
                      pred_layers: int) -> Dict:
    out: Dict[str, np.ndarray] = {}
    f = hf_state

    def put(src, dst, fn=np.asarray):
        if src in f:
            out[dst] = fn(f[src])

    base = "vjepa2." if any(k.startswith("vjepa2.") for k in f) else ""
    e = base + "encoder."
    # the reference's vendored copy names the conv `proj_3d`
    # (modeling_vjepa.py:119); upstream HF transformers names it `proj`
    for conv in ("proj_3d", "proj"):
        put(e + f"embeddings.patch_embeddings.{conv}.weight",
            "params.encoder.patch_embed_kernel")
        put(e + f"embeddings.patch_embeddings.{conv}.bias",
            "params.encoder.patch_embed_bias")
    for i in range(num_layers):
        _block_map(f, e + "layer", i, out, "params.encoder.encoder", "vjepa")
    put(e + "layernorm.weight", "params.encoder.layernorm.scale")
    put(e + "layernorm.bias", "params.encoder.layernorm.bias")

    p = base + "predictor."
    put(p + "embeddings.predictor_embeddings.weight",
        "params.predictor.predictor_embeddings.kernel", _t)
    put(p + "embeddings.predictor_embeddings.bias",
        "params.predictor.predictor_embeddings.bias")
    put(p + "embeddings.mask_tokens", "params.predictor.mask_tokens")
    for i in range(pred_layers):
        _block_map(f, p + "layer", i, out, "params.predictor.stack", "vjepa")
    put(p + "layernorm.weight", "params.predictor.layernorm.scale")
    put(p + "layernorm.bias", "params.predictor.layernorm.bias")
    put(p + "proj.weight", "params.predictor.proj.kernel", _t)
    put(p + "proj.bias", "params.predictor.proj.bias")

    # attentive pooler + classifier (VJEPA2ForVideoClassification)
    pool = "pooler."
    if any(k.startswith(pool) for k in f):
        o = "params.pooler."
        put(pool + "query_tokens", o + "query_tokens")
        c = pool + "cross_attention_layer."
        put(c + "layer_norm1.weight", o + "cross_norm1.scale")
        put(c + "layer_norm1.bias", o + "cross_norm1.bias")
        put(c + "layer_norm2.weight", o + "cross_norm2.scale")
        put(c + "layer_norm2.bias", o + "cross_norm2.bias")
        for hf_n, our_n in (("q_proj", "query"), ("k_proj", "key"),
                            ("v_proj", "value")):
            put(c + f"cross_attn.{hf_n}.weight",
                o + f"cross_attn.{our_n}.kernel", _t)
            put(c + f"cross_attn.{hf_n}.bias",
                o + f"cross_attn.{our_n}.bias")
        put(c + "mlp.fc1.weight", o + "cross_mlp.fc1.kernel", _t)
        put(c + "mlp.fc1.bias", o + "cross_mlp.fc1.bias")
        put(c + "mlp.fc2.weight", o + "cross_mlp.fc2.kernel", _t)
        put(c + "mlp.fc2.bias", o + "cross_mlp.fc2.bias")
        i = 0
        while any(k.startswith(f"{pool}self_attention_layers.{i}.")
                  for k in f):
            sl = f"{pool}self_attention_layers.{i}."
            ol = o + f"self_layer_{i}_"
            put(sl + "layer_norm1.weight", ol + "norm1.scale")
            put(sl + "layer_norm1.bias", ol + "norm1.bias")
            put(sl + "layer_norm2.weight", ol + "norm2.scale")
            put(sl + "layer_norm2.bias", ol + "norm2.bias")
            for hf_n, our_n in (("q_proj", "query"), ("k_proj", "key"),
                                ("v_proj", "value"), ("out_proj", "proj")):
                put(sl + f"self_attn.{hf_n}.weight",
                    ol + f"attn.{our_n}.kernel", _t)
                put(sl + f"self_attn.{hf_n}.bias",
                    ol + f"attn.{our_n}.bias")
            put(sl + "mlp.fc1.weight", ol + "mlp.fc1.kernel", _t)
            put(sl + "mlp.fc1.bias", ol + "mlp.fc1.bias")
            put(sl + "mlp.fc2.weight", ol + "mlp.fc2.kernel", _t)
            put(sl + "mlp.fc2.bias", ol + "mlp.fc2.bias")
            i += 1
    put("classifier.weight", "params.classifier.kernel", _t)
    put("classifier.bias", "params.classifier.bias")
    return unflatten_params(out)


def convert_hf_dinov2(hf_state: Dict[str, np.ndarray], num_layers: int,
                      depth_patch: Optional[int] = None,
                      depth_grid: Optional[int] = None) -> Dict:
    """HF DINOv2 checkpoint -> our Dinov2ForImageClassification pytree.

    Accepts both the reference's 3D Conv3d patch embed (5D weight,
    /root/reference/src/models/dinov2/modeling_dinov2.py:121-158) and
    upstream 2D checkpoints (4D weight): 2D weights are depth-inflated by
    replicating across `depth_patch` taps scaled by 1/depth_patch (I3D
    inflation — a depth-constant input then reproduces the 2D activations
    exactly; verified in tests/test_hf_parity.py). For 2D checkpoints,
    pass `depth_grid` (= config.depth // patch_size) so the learned 2D
    position table is tiled across depth too."""
    out: Dict[str, np.ndarray] = {}
    f = hf_state

    def put(src, dst, fn=np.asarray):
        if src in f:
            out[dst] = fn(f[src])

    base = "dinov2." if any(k.startswith("dinov2.") for k in f) else ""
    e = base + "embeddings."
    proj = e + "patch_embeddings.projection.weight"
    was_2d = False
    if proj in f:
        w = np.asarray(f[proj])
        if w.ndim == 4:
            if not depth_patch:
                raise ValueError("2D DINOv2 checkpoint needs depth_patch "
                                 "for Conv3d inflation")
            was_2d = True
            w = np.repeat(w[..., None], depth_patch, axis=-1) / depth_patch
        out["params.dinov2.patch_embed_kernel"] = w
    put(e + "patch_embeddings.projection.bias",
        "params.dinov2.patch_embed_bias")
    put(e + "cls_token", "params.dinov2.cls_token")
    put(e + "mask_token", "params.dinov2.mask_token")
    put(e + "position_embeddings", "params.dinov2.position_embeddings_3d")
    put(e + "position_embeddings_3d", "params.dinov2.position_embeddings_3d")
    pos_key = "params.dinov2.position_embeddings_3d"
    if was_2d and pos_key in out and depth_grid:
        # inflate the 2D (1, 1+H'W', D) table across the depth grid in the
        # model's (h, w, d) token order (depth FASTEST, dinov2.py::
        # _patchify_chw) — every depth slice starts from the 2D spatial
        # position, mirroring the I3D conv inflation. Without this, any
        # depth_grid > 1 target got a size-mismatched pos table that
        # either crashed apply or silently kept random init.
        pos = np.asarray(out[pos_key])
        cls_pos, patch_pos = pos[:, :1], pos[:, 1:]
        out[pos_key] = np.concatenate(
            [cls_pos, np.repeat(patch_pos, depth_grid, axis=1)], axis=1)

    for i in range(num_layers):
        p = f"{base}encoder.layer.{i}."
        o = f"params.dinov2.encoder.layer_{i}."
        for hf_n, our_n in (("query", "query"), ("key", "key"),
                            ("value", "value")):
            put(p + f"attention.attention.{hf_n}.weight",
                o + f"attention.{our_n}.kernel", _t)
            put(p + f"attention.attention.{hf_n}.bias",
                o + f"attention.{our_n}.bias")
        put(p + "attention.output.dense.weight",
            o + "attention.proj.kernel", _t)
        put(p + "attention.output.dense.bias", o + "attention.proj.bias")
        put(p + "layer_scale1.lambda1", o + "layerscale1")
        put(p + "layer_scale2.lambda1", o + "layerscale2")
        put(p + "norm1.weight", o + "norm1.scale")
        put(p + "norm1.bias", o + "norm1.bias")
        put(p + "norm2.weight", o + "norm2.scale")
        put(p + "norm2.bias", o + "norm2.bias")
        put(p + "mlp.fc1.weight", o + "mlp.fc1.kernel", _t)
        put(p + "mlp.fc1.bias", o + "mlp.fc1.bias")
        put(p + "mlp.fc2.weight", o + "mlp.fc2.kernel", _t)
        put(p + "mlp.fc2.bias", o + "mlp.fc2.bias")
        put(p + "mlp.weights_in.weight", o + "mlp.weights_in.kernel", _t)
        put(p + "mlp.weights_in.bias", o + "mlp.weights_in.bias")
        put(p + "mlp.weights_out.weight", o + "mlp.weights_out.kernel", _t)
        put(p + "mlp.weights_out.bias", o + "mlp.weights_out.bias")

    put(base + "layernorm.weight", "params.dinov2.layernorm.scale")
    put(base + "layernorm.bias", "params.dinov2.layernorm.bias")
    put("classifier.weight", "params.classifier.kernel", _t)
    put("classifier.bias", "params.classifier.bias")
    return unflatten_params(out)


# ---------------------------------------------------------------------------
# flax pytree -> HuggingFace torch state dict (inverse mapping)
# ---------------------------------------------------------------------------

def _invert_block(flat: Dict[str, np.ndarray], our_prefix: str, layer: int,
                  out: Dict[str, np.ndarray], hf_prefix: str,
                  hf_style: str) -> None:
    o = f"{our_prefix}.layer_{layer}."
    p = f"{hf_prefix}.{layer}."
    if hf_style == "videomae":
        pairs = [
            (o + "attention.query.kernel", p + "attention.attention.query.weight", _t),
            (o + "attention.key.kernel", p + "attention.attention.key.weight", _t),
            (o + "attention.value.kernel", p + "attention.attention.value.weight", _t),
            (o + "attention.query.bias", p + "attention.attention.q_bias", np.asarray),
            (o + "attention.value.bias", p + "attention.attention.v_bias", np.asarray),
            (o + "attention.proj.kernel", p + "attention.output.dense.weight", _t),
            (o + "attention.proj.bias", p + "attention.output.dense.bias", np.asarray),
            (o + "mlp.fc1.kernel", p + "intermediate.dense.weight", _t),
            (o + "mlp.fc1.bias", p + "intermediate.dense.bias", np.asarray),
            (o + "mlp.fc2.kernel", p + "output.dense.weight", _t),
            (o + "mlp.fc2.bias", p + "output.dense.bias", np.asarray),
            (o + "norm1.scale", p + "layernorm_before.weight", np.asarray),
            (o + "norm1.bias", p + "layernorm_before.bias", np.asarray),
            (o + "norm2.scale", p + "layernorm_after.weight", np.asarray),
            (o + "norm2.bias", p + "layernorm_after.bias", np.asarray),
        ]
    elif hf_style == "siglip":
        pairs = [
            (o + "attention.query.kernel", p + "self_attn.q_proj.weight", _t),
            (o + "attention.query.bias", p + "self_attn.q_proj.bias", np.asarray),
            (o + "attention.key.kernel", p + "self_attn.k_proj.weight", _t),
            (o + "attention.key.bias", p + "self_attn.k_proj.bias", np.asarray),
            (o + "attention.value.kernel", p + "self_attn.v_proj.weight", _t),
            (o + "attention.value.bias", p + "self_attn.v_proj.bias", np.asarray),
            (o + "attention.proj.kernel", p + "self_attn.out_proj.weight", _t),
            (o + "attention.proj.bias", p + "self_attn.out_proj.bias", np.asarray),
            (o + "mlp.fc1.kernel", p + "mlp.fc1.weight", _t),
            (o + "mlp.fc1.bias", p + "mlp.fc1.bias", np.asarray),
            (o + "mlp.fc2.kernel", p + "mlp.fc2.weight", _t),
            (o + "mlp.fc2.bias", p + "mlp.fc2.bias", np.asarray),
            (o + "norm1.scale", p + "layer_norm1.weight", np.asarray),
            (o + "norm1.bias", p + "layer_norm1.bias", np.asarray),
            (o + "norm2.scale", p + "layer_norm2.weight", np.asarray),
            (o + "norm2.bias", p + "layer_norm2.bias", np.asarray),
        ]
    else:
        pairs = [
            (o + "attention.query.kernel", p + "attention.query.weight", _t),
            (o + "attention.query.bias", p + "attention.query.bias", np.asarray),
            (o + "attention.key.kernel", p + "attention.key.weight", _t),
            (o + "attention.key.bias", p + "attention.key.bias", np.asarray),
            (o + "attention.value.kernel", p + "attention.value.weight", _t),
            (o + "attention.value.bias", p + "attention.value.bias", np.asarray),
            (o + "attention.proj.kernel", p + "attention.proj.weight", _t),
            (o + "attention.proj.bias", p + "attention.proj.bias", np.asarray),
            (o + "mlp.fc1.kernel", p + "mlp.fc1.weight", _t),
            (o + "mlp.fc1.bias", p + "mlp.fc1.bias", np.asarray),
            (o + "mlp.fc2.kernel", p + "mlp.fc2.weight", _t),
            (o + "mlp.fc2.bias", p + "mlp.fc2.bias", np.asarray),
            (o + "norm1.scale", p + "norm1.weight", np.asarray),
            (o + "norm1.bias", p + "norm1.bias", np.asarray),
            (o + "norm2.scale", p + "norm2.weight", np.asarray),
            (o + "norm2.bias", p + "norm2.bias", np.asarray),
        ]
    for src, dst, fn in pairs:
        if src in flat:
            out[dst] = fn(flat[src])


def export_hf_videomae(params, num_layers: int, decoder_layers: int = 0
                       ) -> Dict[str, np.ndarray]:
    """flax params (VideoMAEModel / ...ForPreTraining /
    ...ForVideoClassification namespaces) -> HF torch state dict arrays
    (the push_to_hub round-trip, reference run_mim.py:464-467)."""
    flat = flatten_params(params)
    # accept both bare-encoder and videomae-wrapped namespaces; a wrapped
    # tree WITHOUT head params exports bare (hf VideoMAEModel layout) —
    # keeping the videomae. prefix there would make load_state_dict match
    # zero keys
    if any(k.startswith("params.videomae.") for k in flat):
        enc = "params.videomae"
        base = "videomae." if any(
            k.startswith("params.encoder_to_decoder") or
            k.startswith("params.fc_norm") or
            k.startswith("params.classifier") for k in flat) else ""
    else:
        enc = "params"
        base = ""
    out: Dict[str, np.ndarray] = {}

    def put(src, dst, fn=np.asarray):
        if src in flat:
            out[dst] = fn(flat[src])

    put(enc + ".patch_embed_kernel",
        base + "embeddings.patch_embeddings.projection.weight")
    put(enc + ".patch_embed_bias",
        base + "embeddings.patch_embeddings.projection.bias")
    for i in range(num_layers):
        _invert_block(flat, enc + ".encoder", i, out,
                      base + "encoder.layer", "videomae")
    put(enc + ".layernorm.scale", base + "layernorm.weight")
    put(enc + ".layernorm.bias", base + "layernorm.bias")

    put("params.encoder_to_decoder.kernel", "encoder_to_decoder.weight", _t)
    put("params.mask_token", "mask_token")
    for i in range(decoder_layers):
        _invert_block(flat, "params.decoder", i, out,
                      "decoder.decoder_layers", "videomae")
    put("params.decoder_norm.scale", "decoder.norm.weight")
    put("params.decoder_norm.bias", "decoder.norm.bias")
    put("params.decoder_head.kernel", "decoder.head.weight", _t)
    put("params.decoder_head.bias", "decoder.head.bias")
    put("params.fc_norm.scale", "fc_norm.weight")
    put("params.fc_norm.bias", "fc_norm.bias")
    put("params.classifier.kernel", "classifier.weight", _t)
    put("params.classifier.bias", "classifier.bias")
    return out


def export_hf_vjepa2(params, num_layers: int, pred_layers: int = 0,
                     pooler_self_layers: int = 0, *, wrap: bool = False,
                     conv_name: str = "proj") -> Dict[str, np.ndarray]:
    """flax VJEPA2Model / VJEPA2ForVideoClassification params -> HF torch
    state dict arrays (inverse of convert_hf_vjepa2) — the push_to_hub
    round-trip the reference publishes with (upload_model.py:6-23,
    run_mim.py:464-467).

    wrap=True prefixes backbone keys with 'vjepa2.' (the
    VJEPA2ForVideoClassification layout); conv_name selects the patch-embed
    conv key: 'proj' (upstream HF transformers) or 'proj_3d' (the
    reference's vendored modeling_vjepa.py:119). convert_hf_vjepa2 accepts
    both, so export -> convert is the identity either way."""
    flat = flatten_params(params)
    out: Dict[str, np.ndarray] = {}

    def put(src, dst, fn=np.asarray):
        if src in flat:
            out[dst] = fn(flat[src])

    if not any(k.startswith("params.encoder.") for k in flat):
        raise ValueError("params do not look like a VJEPA2 pytree "
                         "(missing params.encoder.*)")
    base = "vjepa2." if wrap else ""
    e = base + "encoder."
    put("params.encoder.patch_embed_kernel",
        e + f"embeddings.patch_embeddings.{conv_name}.weight")
    put("params.encoder.patch_embed_bias",
        e + f"embeddings.patch_embeddings.{conv_name}.bias")
    for i in range(num_layers):
        _invert_block(flat, "params.encoder.encoder", i, out,
                      e + "layer", "vjepa")
    put("params.encoder.layernorm.scale", e + "layernorm.weight")
    put("params.encoder.layernorm.bias", e + "layernorm.bias")

    p = base + "predictor."
    put("params.predictor.predictor_embeddings.kernel",
        p + "embeddings.predictor_embeddings.weight", _t)
    put("params.predictor.predictor_embeddings.bias",
        p + "embeddings.predictor_embeddings.bias")
    put("params.predictor.mask_tokens", p + "embeddings.mask_tokens")
    for i in range(pred_layers):
        _invert_block(flat, "params.predictor.stack", i, out,
                      p + "layer", "vjepa")
    put("params.predictor.layernorm.scale", p + "layernorm.weight")
    put("params.predictor.layernorm.bias", p + "layernorm.bias")
    put("params.predictor.proj.kernel", p + "proj.weight", _t)
    put("params.predictor.proj.bias", p + "proj.bias")

    # attentive pooler + classifier (inverse of the pooler branch above)
    o = "params.pooler."
    if any(k.startswith(o) for k in flat):
        pool = "pooler."
        put(o + "query_tokens", pool + "query_tokens")
        c = pool + "cross_attention_layer."
        put(o + "cross_norm1.scale", c + "layer_norm1.weight")
        put(o + "cross_norm1.bias", c + "layer_norm1.bias")
        put(o + "cross_norm2.scale", c + "layer_norm2.weight")
        put(o + "cross_norm2.bias", c + "layer_norm2.bias")
        for hf_n, our_n in (("q_proj", "query"), ("k_proj", "key"),
                            ("v_proj", "value")):
            put(o + f"cross_attn.{our_n}.kernel",
                c + f"cross_attn.{hf_n}.weight", _t)
            put(o + f"cross_attn.{our_n}.bias",
                c + f"cross_attn.{hf_n}.bias")
        put(o + "cross_mlp.fc1.kernel", c + "mlp.fc1.weight", _t)
        put(o + "cross_mlp.fc1.bias", c + "mlp.fc1.bias")
        put(o + "cross_mlp.fc2.kernel", c + "mlp.fc2.weight", _t)
        put(o + "cross_mlp.fc2.bias", c + "mlp.fc2.bias")
        for i in range(pooler_self_layers):
            sl = f"{pool}self_attention_layers.{i}."
            ol = o + f"self_layer_{i}_"
            put(ol + "norm1.scale", sl + "layer_norm1.weight")
            put(ol + "norm1.bias", sl + "layer_norm1.bias")
            put(ol + "norm2.scale", sl + "layer_norm2.weight")
            put(ol + "norm2.bias", sl + "layer_norm2.bias")
            for hf_n, our_n in (("q_proj", "query"), ("k_proj", "key"),
                                ("v_proj", "value"), ("out_proj", "proj")):
                put(ol + f"attn.{our_n}.kernel",
                    sl + f"self_attn.{hf_n}.weight", _t)
                put(ol + f"attn.{our_n}.bias",
                    sl + f"self_attn.{hf_n}.bias")
            put(ol + "mlp.fc1.kernel", sl + "mlp.fc1.weight", _t)
            put(ol + "mlp.fc1.bias", sl + "mlp.fc1.bias")
            put(ol + "mlp.fc2.kernel", sl + "mlp.fc2.weight", _t)
            put(ol + "mlp.fc2.bias", sl + "mlp.fc2.bias")
    put("params.classifier.kernel", "classifier.weight", _t)
    put("params.classifier.bias", "classifier.bias")
    return out


def export_hf_dinov2(params, num_layers: int) -> Dict[str, np.ndarray]:
    """flax Dinov2Model / Dinov2ForImageClassification params -> HF torch
    state dict arrays (inverse of convert_hf_dinov2; 3D Conv3d weight is
    exported as-is — loadable by the reference's vendored 3D DINOv2)."""
    flat = flatten_params(params)
    wrapped = any(k.startswith("params.dinov2.") for k in flat)
    enc = "params.dinov2." if wrapped else "params."
    base = "dinov2." if wrapped else ""
    out: Dict[str, np.ndarray] = {}

    def put(src, dst, fn=np.asarray):
        if src in flat:
            out[dst] = fn(flat[src])

    e = base + "embeddings."
    put(enc + "patch_embed_kernel",
        e + "patch_embeddings.projection.weight")
    put(enc + "patch_embed_bias", e + "patch_embeddings.projection.bias")
    put(enc + "cls_token", e + "cls_token")
    put(enc + "mask_token", e + "mask_token")
    put(enc + "position_embeddings_3d", e + "position_embeddings_3d")
    for i in range(num_layers):
        o = f"{enc}encoder.layer_{i}."
        p = f"{base}encoder.layer.{i}."
        for our_n, hf_n in (("query", "query"), ("key", "key"),
                            ("value", "value")):
            put(o + f"attention.{our_n}.kernel",
                p + f"attention.attention.{hf_n}.weight", _t)
            put(o + f"attention.{our_n}.bias",
                p + f"attention.attention.{hf_n}.bias")
        put(o + "attention.proj.kernel",
            p + "attention.output.dense.weight", _t)
        put(o + "attention.proj.bias", p + "attention.output.dense.bias")
        put(o + "layerscale1", p + "layer_scale1.lambda1")
        put(o + "layerscale2", p + "layer_scale2.lambda1")
        put(o + "norm1.scale", p + "norm1.weight")
        put(o + "norm1.bias", p + "norm1.bias")
        put(o + "norm2.scale", p + "norm2.weight")
        put(o + "norm2.bias", p + "norm2.bias")
        put(o + "mlp.fc1.kernel", p + "mlp.fc1.weight", _t)
        put(o + "mlp.fc1.bias", p + "mlp.fc1.bias")
        put(o + "mlp.fc2.kernel", p + "mlp.fc2.weight", _t)
        put(o + "mlp.fc2.bias", p + "mlp.fc2.bias")
        put(o + "mlp.weights_in.kernel", p + "mlp.weights_in.weight", _t)
        put(o + "mlp.weights_in.bias", p + "mlp.weights_in.bias")
        put(o + "mlp.weights_out.kernel", p + "mlp.weights_out.weight", _t)
        put(o + "mlp.weights_out.bias", p + "mlp.weights_out.bias")
    put(enc + "layernorm.scale", base + "layernorm.weight")
    put(enc + "layernorm.bias", base + "layernorm.bias")
    put("params.classifier.kernel", "classifier.weight", _t)
    put("params.classifier.bias", "classifier.bias")
    return out


def convert_hf_siglip(hf_state: Dict[str, np.ndarray], num_layers: int
                      ) -> Dict:
    """HF SiglipVisionModel (or full SiglipModel) torch state ->
    our models/siglip.py pytree. The MAP head's torch
    nn.MultiheadAttention packs q/k/v into in_proj_weight/bias
    ((3D, D)/(3D,)) — split row-wise into the three Dense params."""
    out: Dict[str, np.ndarray] = {}
    f = hf_state

    def put(src, dst, fn=np.asarray):
        if src in f:
            out[dst] = fn(f[src])

    v = "vision_model." if any(k.startswith("vision_model.") for k in f) \
        else ""
    put(v + "embeddings.patch_embedding.weight", "params.patch_embedding")
    put(v + "embeddings.patch_embedding.bias", "params.patch_bias")
    put(v + "embeddings.position_embedding.weight",
        "params.position_embedding")
    for i in range(num_layers):
        _block_map(f, v + "encoder.layers", i, out, "params.encoder",
                   "siglip")
    put(v + "post_layernorm.weight", "params.post_layernorm.scale")
    put(v + "post_layernorm.bias", "params.post_layernorm.bias")

    h = v + "head."
    if any(k.startswith(h) for k in f):
        o = "params.head."
        put(h + "probe", o + "probe")
        if h + "attention.in_proj_weight" in f:
            w3 = np.asarray(f[h + "attention.in_proj_weight"])
            b3 = np.asarray(f[h + "attention.in_proj_bias"])
            d = w3.shape[0] // 3
            for j, name in enumerate(("query", "key", "value")):
                out[o + f"attention.{name}.kernel"] = _t(
                    w3[j * d:(j + 1) * d])
                out[o + f"attention.{name}.bias"] = b3[j * d:(j + 1) * d]
        put(h + "attention.out_proj.weight", o + "attention.proj.kernel",
            _t)
        put(h + "attention.out_proj.bias", o + "attention.proj.bias")
        put(h + "layernorm.weight", o + "layernorm.scale")
        put(h + "layernorm.bias", o + "layernorm.bias")
        put(h + "mlp.fc1.weight", o + "mlp.fc1.kernel", _t)
        put(h + "mlp.fc1.bias", o + "mlp.fc1.bias")
        put(h + "mlp.fc2.weight", o + "mlp.fc2.kernel", _t)
        put(h + "mlp.fc2.bias", o + "mlp.fc2.bias")
    return unflatten_params(out)


def export_hf_siglip(params, num_layers: int) -> Dict[str, np.ndarray]:
    """Inverse of convert_hf_siglip (vision_model.* namespace, q/k/v
    re-packed into nn.MultiheadAttention's in_proj_weight/bias)."""
    flat = flatten_params(params)
    out: Dict[str, np.ndarray] = {}

    def put(src, dst, fn=np.asarray):
        if src in flat:
            out[dst] = fn(flat[src])

    v = "vision_model."
    put("params.patch_embedding", v + "embeddings.patch_embedding.weight")
    put("params.patch_bias", v + "embeddings.patch_embedding.bias")
    put("params.position_embedding",
        v + "embeddings.position_embedding.weight")
    for i in range(num_layers):
        _invert_block(flat, "params.encoder", i, out,
                      v + "encoder.layers", "siglip")
    put("params.post_layernorm.scale", v + "post_layernorm.weight")
    put("params.post_layernorm.bias", v + "post_layernorm.bias")

    o = "params.head."
    if any(k.startswith(o) for k in flat):
        h = v + "head."
        put(o + "probe", h + "probe")
        if o + "attention.query.kernel" in flat:
            out[h + "attention.in_proj_weight"] = np.concatenate(
                [_t(flat[o + f"attention.{n}.kernel"])
                 for n in ("query", "key", "value")], axis=0)
            out[h + "attention.in_proj_bias"] = np.concatenate(
                [np.asarray(flat[o + f"attention.{n}.bias"])
                 for n in ("query", "key", "value")], axis=0)
        put(o + "attention.proj.kernel", h + "attention.out_proj.weight",
            _t)
        put(o + "attention.proj.bias", h + "attention.out_proj.bias")
        put(o + "layernorm.scale", h + "layernorm.weight")
        put(o + "layernorm.bias", h + "layernorm.bias")
        put(o + "mlp.fc1.kernel", h + "mlp.fc1.weight", _t)
        put(o + "mlp.fc1.bias", h + "mlp.fc1.bias")
        put(o + "mlp.fc2.kernel", h + "mlp.fc2.weight", _t)
        put(o + "mlp.fc2.bias", h + "mlp.fc2.bias")
    return out


def load_hf_checkpoint_numpy(path: str) -> Dict[str, np.ndarray]:
    """Load an HF checkpoint directory/file to a flat numpy dict
    (safetensors preferred, torch .bin fallback). Directories merge ALL
    shards (model-00001-of-0000N.safetensors): large checkpoints are saved
    sharded, and loading only one shard would silently yield a partial
    param tree."""
    from pathlib import Path

    path = Path(path)
    files = [path]
    if path.is_dir():
        files = sorted(path.glob("*.safetensors")) or sorted(
            path.glob("*.bin"))
        if not files:
            raise FileNotFoundError(f"no checkpoint files in {path}")
    out: Dict[str, np.ndarray] = {}
    for f in files:
        if f.suffix == ".safetensors":
            from safetensors.numpy import load_file

            out.update(load_file(str(f)))
        else:
            import torch

            state = torch.load(str(f), map_location="cpu",
                               weights_only=True)
            out.update({k: v.numpy() for k, v in state.items()})
    return out


# ---------------------------------------------------------------------------
# Inflated-3D ResNet (Merlin image tower) — models/resnet3d.py
# ---------------------------------------------------------------------------

# torch module paths the Merlin checkpoint nests its I3D ResNet under
# (the reference's tower comes from the external `merlin` package,
# run_merlin.py:24: Merlin(ImageEmbedding=True)); bare torchvision-style
# state dicts have no prefix.
_RESNET3D_PREFIXES = ("", "module.", "model.", "i3_resnet.",
                      "encode_image.i3_resnet.",
                      "model.encode_image.i3_resnet.",
                      "image_encoder.i3_resnet.")


def _resnet3d_prefix(flat: Dict[str, np.ndarray]) -> str:
    """Find the module prefix under which a torch-schema (i3d-)resnet
    lives: the one whose `conv1.weight` is a 5D conv kernel. Checked
    longest-first so a nested tower wins over a same-named outer key."""
    for p in sorted(_RESNET3D_PREFIXES, key=len, reverse=True):
        w = flat.get(p + "conv1.weight")
        if w is not None and np.ndim(w) == 5:
            return p
    raise ValueError(
        "no inflated-3D resnet found: no '<prefix>conv1.weight' 5D kernel "
        f"under any of {_RESNET3D_PREFIXES}")


def resnet3d_config_from_state_dict(flat: Dict[str, np.ndarray],
                                    **overrides):
    """Derive a ResNet3DConfig from torch state-dict shapes: channel
    counts, stage depths and the per-element axis-0 kernel sizes are all
    visible in the weights. Axis-0 *strides* are not — they stay at the
    I3D-recipe defaults unless overridden (ResNet3DConfig docstring)."""
    from smb_vision_tpu.models.configs import ResNet3DConfig

    import re

    p = _resnet3d_prefix(flat)
    conv1 = np.asarray(flat[p + "conv1.weight"])
    stage_sizes = []
    for i in range(1, 100):
        n = _layer_count(
            flat, re.escape(p) + rf"layer{i}\.(\d+)\.conv1\.weight")
        if n == 0:
            break
        stage_sizes.append(n)
    if not stage_sizes:
        raise ValueError(f"no layer1.*.conv1.weight under prefix {p!r}")
    c3 = np.asarray(flat[p + "layer1.0.conv3.weight"])
    conv2_ts = {
        np.asarray(flat[k]).shape[2]
        for k in flat if k.startswith(p) and ".conv2.weight" in k}
    if len(conv2_ts) != 1:
        raise ValueError(
            f"non-uniform bottleneck conv2 axis-0 kernels {conv2_ts}: "
            "this tower family inflates uniformly; pass an explicit "
            "config for exotic checkpoints")
    fc = flat.get(p + "fc.weight")
    cfg = ResNet3DConfig(
        num_channels=int(conv1.shape[1]),
        base_width=int(conv1.shape[0]),
        stage_sizes=tuple(stage_sizes),
        expansion=int(c3.shape[0]) // int(c3.shape[1]),
        stem_kernel_t=int(conv1.shape[2]),
        conv2_kernel_t=int(conv2_ts.pop()),
        num_labels=int(np.asarray(fc).shape[0]) if fc is not None else 0,
    )
    cfg.update(overrides)
    return cfg


def _conv3d_t(w) -> np.ndarray:
    # torch Conv3d (O, I, k0, k1, k2) -> flax nn.Conv (k0, k1, k2, I, O)
    return np.transpose(np.asarray(w), (2, 3, 4, 1, 0))


def convert_torch_resnet3d(flat: Dict[str, np.ndarray], config=None
                           ) -> Dict:
    """torch-schema inflated-3D resnet state dict (torchvision key names,
    any of the Merlin module prefixes) -> models/resnet3d.py pytree.
    Every expected parameter must be present — a partial tower would
    silently embed garbage."""
    if config is None:
        config = resnet3d_config_from_state_dict(flat)
    p = _resnet3d_prefix(flat)
    out: Dict[str, np.ndarray] = {}

    def bn(src, dst):
        for a, b in (("weight", "scale"), ("bias", "bias"),
                     ("running_mean", "mean"), ("running_var", "var")):
            k = f"{p}{src}.{a}"
            if k not in flat:
                raise KeyError(f"missing {k}")
            out[f"params.{dst}.{b}"] = np.asarray(flat[k],
                                                  dtype=np.float32)

    def conv(src, dst):
        k = f"{p}{src}.weight"
        if k not in flat:
            raise KeyError(f"missing {k}")
        out[f"params.{dst}.kernel"] = _conv3d_t(flat[k])

    conv("conv1", "stem.conv")
    bn("bn1", "stem.bn")
    for i, n in enumerate(config.stage_sizes):
        for j in range(n):
            src = f"layer{i + 1}.{j}"
            dst = f"layer{i + 1}_{j}"
            for c in (1, 2, 3):
                conv(f"{src}.conv{c}", f"{dst}.cb{c}.conv")
                bn(f"{src}.bn{c}", f"{dst}.cb{c}.bn")
            if j == 0:
                conv(f"{src}.downsample.0", f"{dst}.downsample.conv")
                bn(f"{src}.downsample.1", f"{dst}.downsample.bn")
    if config.num_labels > 0:
        out["params.head.kernel"] = _t(flat[p + "fc.weight"])
        out["params.head.bias"] = np.asarray(flat[p + "fc.bias"])
    return unflatten_params(out)


def inflate_resnet2d(flat2d: Dict[str, np.ndarray], *,
                     stem_kernel_t: int = 7, conv2_kernel_t: int = 3,
                     mode: str = "center") -> Dict[str, np.ndarray]:
    """I3D inflation: a torchvision-schema 2D ResNet state dict -> the
    3D torch-schema dict convert_torch_resnet3d consumes. The stem conv
    inflates to `stem_kernel_t`, bottleneck conv2 to `conv2_kernel_t`;
     1x1 convs (bottleneck conv1/conv3, downsample) stay axis-0 size 1 —
    the standard inflation recipe (Merlin's tower is built this way from
    torchvision resnet152).

    mode="center": all weight in the center axis-0 slice (a fresh 3D
    network computes EXACTLY the 2D response independently per slice —
    the property tests/test_resnet3d.py asserts). mode="average": weight
    replicated /= k_t (the I3D paper's boring-video-preserving init,
    equal to 2D on axis-0-constant inputs away from the zero-padded
    borders)."""
    if mode not in ("center", "average"):
        raise ValueError(f"unknown inflation mode {mode!r}")
    out: Dict[str, np.ndarray] = {}
    for k, v in flat2d.items():
        v = np.asarray(v)
        if k.endswith(".weight") and v.ndim == 4:
            if k.endswith("conv1.weight") and "layer" not in k:
                kt = stem_kernel_t
            elif ".conv2.weight" in k:
                kt = conv2_kernel_t
            else:
                kt = 1
            w3 = np.zeros(v.shape[:2] + (kt,) + v.shape[2:], v.dtype)
            if mode == "center":
                w3[:, :, kt // 2] = v
            else:
                w3[:] = v[:, :, None] / kt
            out[k] = w3
        else:
            out[k] = v
    return out


def export_torch_resnet3d(params, config) -> Dict[str, np.ndarray]:
    """Inverse of convert_torch_resnet3d: models/resnet3d.py pytree ->
    bare torchvision-schema 3D state dict (no module prefix — the ""
    entry of _RESNET3D_PREFIXES, so the output round-trips through
    convert_torch_resnet3d). Conv kernels transpose back to torch
    (O, I, k0, k1, k2); frozen-BN stats map back to weight/bias/
    running_mean/running_var."""
    flat = flatten_params(params)
    out: Dict[str, np.ndarray] = {}

    def conv(src, dst):
        out[dst + ".weight"] = np.transpose(
            np.asarray(flat[f"params.{src}.kernel"]), (4, 3, 0, 1, 2))

    def bn(src, dst):
        for a, b in (("weight", "scale"), ("bias", "bias"),
                     ("running_mean", "mean"), ("running_var", "var")):
            out[f"{dst}.{a}"] = np.asarray(flat[f"params.{src}.{b}"],
                                           dtype=np.float32)

    conv("stem.conv", "conv1")
    bn("stem.bn", "bn1")
    for i, n in enumerate(config.stage_sizes):
        for j in range(n):
            src = f"layer{i + 1}_{j}"
            dst = f"layer{i + 1}.{j}"
            for c in (1, 2, 3):
                conv(f"{src}.cb{c}.conv", f"{dst}.conv{c}")
                bn(f"{src}.cb{c}.bn", f"{dst}.bn{c}")
            if j == 0:
                conv(f"{src}.downsample.conv", f"{dst}.downsample.0")
                bn(f"{src}.downsample.bn", f"{dst}.downsample.1")
    if config.num_labels > 0:
        out["fc.weight"] = _t(flat["params.head.kernel"])
        out["fc.bias"] = np.asarray(flat["params.head.bias"])
    return out
