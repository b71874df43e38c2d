"""Export a trained smb-vision-tpu checkpoint to an HF-torch-loadable
safetensors file (the push_to_hub round trip; reference publishes via
scripts/upload_model.py:6-23 + run_mim.py:464-467 push_to_hub).

Usage:
  python scripts/export_hf.py --model_dir output/ --out hf_export/ \
      [--family auto|videomae|vjepa2] [--wrap] [--conv_name proj|proj_3d]

Reads model.safetensors + config.json written by the training CLIs and
writes hf_export/model.safetensors (+ a copy of config.json). The result
loads into transformers VideoMAEForPreTraining / VJEPA2Model with
load_state_dict(..., strict=False) — only fixed sincos position buffers are
absent (they are recomputed by the torch model).
"""

from __future__ import annotations

import argparse
import json
import shutil
from pathlib import Path


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--model_dir", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--family", default="auto",
                    choices=["auto", "videomae", "vjepa2", "dinov2"])
    ap.add_argument("--wrap", action="store_true",
                    help="vjepa2: prefix backbone keys with 'vjepa2.' "
                         "(VJEPA2ForVideoClassification layout)")
    ap.add_argument("--conv_name", default="proj",
                    choices=["proj", "proj_3d"],
                    help="vjepa2 patch-embed conv key: upstream HF uses "
                         "'proj', the reference's vendored copy 'proj_3d'")
    args = ap.parse_args(argv)

    from safetensors.numpy import save_file

    from smb_vision_tpu.models.convert import (
        export_hf_dinov2,
        export_hf_videomae,
        export_hf_vjepa2,
    )
    from smb_vision_tpu.utils.serialization import load_params_safetensors

    model_dir = Path(args.model_dir)
    cfg = json.loads((model_dir / "config.json").read_text())
    params = {"params": load_params_safetensors(
        model_dir / "model.safetensors")}
    family = args.family
    if family == "auto":
        mt = cfg.get("model_type")
        family = (mt if mt in ("vjepa2", "dinov2", "videomae")
                  else "vjepa2" if "pred_num_hidden_layers" in cfg
                  else "videomae")

    if family == "dinov2":
        state = export_hf_dinov2(params,
                                 num_layers=cfg["num_hidden_layers"])
    elif family == "vjepa2":
        state = export_hf_vjepa2(
            params, num_layers=cfg["num_hidden_layers"],
            pred_layers=cfg.get("pred_num_hidden_layers", 0),
            pooler_self_layers=cfg.get("num_pooler_layers", 0),
            wrap=args.wrap, conv_name=args.conv_name)
    else:
        state = export_hf_videomae(
            params, num_layers=cfg["num_hidden_layers"],
            decoder_layers=cfg.get("decoder_num_hidden_layers", 0))
    if not state:
        raise ValueError(f"nothing exported — is {model_dir} a {family} "
                         f"checkpoint?")

    out = Path(args.out)
    out.mkdir(parents=True, exist_ok=True)
    save_file(state, str(out / "model.safetensors"))
    shutil.copy(model_dir / "config.json", out / "config.json")
    print(f"exported {len(state)} tensors ({family}) to "
          f"{out / 'model.safetensors'}")


if __name__ == "__main__":
    main()
