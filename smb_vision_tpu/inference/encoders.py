"""External-model encoders for the zoo (reference src/encoders/run_merlin.py
and run_siglip.py). These wrap third-party checkpoints behind the
BaseEncoder interface; they are environment-gated (torch/transformers for
SigLIP, the external `merlin` package for Merlin) and fail with actionable
errors instead of the reference's broken imports (SURVEY §2 item 2)."""

from __future__ import annotations

from typing import Dict, List, Optional

import numpy as np

from smb_vision_tpu.inference.runner import BaseEncoder
from smb_vision_tpu.utils.logging import get_logger

logger = get_logger(__name__)


class SiglipEncoder(BaseEncoder):
    """2D X-ray embeddings from a SigLIP vision tower
    (reference run_siglip.py:49-120). Requires a *local* checkpoint path
    (zero-egress environments cannot pull from the hub)."""

    def __init__(self, model_path: str, model_id: str = "siglip",
                 image_size: int = 384, batch_dtype: str = "float32"):
        self.model_path = model_path
        self.model_id = model_id
        self.image_size = image_size
        self._model = None

    def create_dataset(self, items: List[Dict]):
        from smb_vision_tpu.data.image2d import Image2DDataset

        return Image2DDataset(items, image_size=self.image_size)

    def setup_model(self):
        try:
            import torch
            from transformers import AutoModel
        except ImportError as e:
            raise RuntimeError(
                "SiglipEncoder needs torch+transformers installed") from e
        self._torch = torch
        self._model = AutoModel.from_pretrained(
            self.model_path, local_files_only=True).vision_model.eval()

    def generate_embedding(self, batch: np.ndarray) -> np.ndarray:
        torch = self._torch
        with torch.inference_mode():
            out = self._model(torch.from_numpy(batch))
        return out.pooler_output.numpy()


class MerlinEncoder(BaseEncoder):
    """Merlin CT foundation model (reference run_merlin.py — whose imports
    were broken in the reference repo). Requires the external `merlin`
    package; the dataset path reuses this framework's CT pipeline."""

    def __init__(self, model_id: str = "merlin",
                 checkpoint: Optional[str] = None):
        self.model_id = model_id
        self.checkpoint = checkpoint
        self._model = None

    def create_dataset(self, items: List[Dict]):
        from smb_vision_tpu.data.dataset import CTDataset

        norm = [{"image": it.get("image_path", it.get("image")), **it}
                for it in items]
        return CTDataset(items=norm, pipeline="merlin")

    def setup_model(self):
        try:
            import merlin  # type: ignore
        except ImportError as e:
            raise RuntimeError(
                "MerlinEncoder needs the external `merlin` package "
                "(https://github.com/StanfordMIMI/Merlin); install it or "
                "use the first-party SmbVisionEncoder") from e
        self._model = merlin.models.Merlin()
        self._model.eval()

    def generate_embedding(self, batch: np.ndarray) -> np.ndarray:
        import torch

        with torch.inference_mode():
            out = self._model(torch.from_numpy(batch))
        return out[0].numpy() if isinstance(out, tuple) else out.numpy()
