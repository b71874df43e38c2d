"""Logging and metric reporting.

Replaces the reference's stdlib-logging + loguru + wandb mix
(run_mim.py:239-261, base_encoder.py:10, run_mim.sh:36-38): one stdlib
logger per module, a jsonl metrics stream in the output dir, and optional
wandb when installed + requested (report_to="wandb")."""

from __future__ import annotations

import json
import logging
import sys
import time
from pathlib import Path
from typing import Dict, Optional

_FORMAT = "%(asctime)s - %(levelname)s - %(name)s - %(message)s"


def get_logger(name: str, level: int = logging.INFO) -> logging.Logger:
    logger = logging.getLogger(name)
    if not logging.getLogger().handlers and not logger.handlers:
        h = logging.StreamHandler(sys.stdout)
        h.setFormatter(logging.Formatter(_FORMAT, datefmt="%m/%d/%Y %H:%M:%S"))
        logger.addHandler(h)
        logger.propagate = False
    logger.setLevel(level)
    return logger


class MetricLogger:
    """Console + metrics.jsonl (+ optional wandb) metric sink."""

    def __init__(self, out_dir: Path, report_to: str = "none",
                 run_name: Optional[str] = None):
        self.out_dir = Path(out_dir)
        self.out_dir.mkdir(parents=True, exist_ok=True)
        self.path = self.out_dir / "metrics.jsonl"
        self.logger = get_logger("metrics")
        # multi-host: only process 0 writes metrics (the reference's
        # per-rank log-level control, run_mim.py:239-261)
        self._primary = True
        try:
            import jax

            self._primary = jax.process_index() == 0
        except Exception:  # noqa: BLE001
            pass
        self._wandb = None
        if report_to == "wandb" and self._primary:
            try:
                import os

                import wandb

                self._wandb = wandb
                if wandb.run is None:
                    # WANDB_PROJECT env selects the project, as in the
                    # reference launch scripts (run_mim.sh:2)
                    wandb.init(project=os.environ.get("WANDB_PROJECT",
                                                      "smb-vision-tpu"),
                               name=run_name)
            except ImportError:
                self.logger.warning(
                    "report_to=wandb requested but wandb is not installed; "
                    "falling back to jsonl only")

    def log(self, record: Dict):
        if not self._primary:
            return
        record = dict(record)
        record.setdefault("time", time.time())
        with open(self.path, "a") as f:
            f.write(json.dumps(record) + "\n")
        show = {k: (round(v, 5) if isinstance(v, float) else v)
                for k, v in record.items() if k != "time"}
        self.logger.info("%s", show)
        if self._wandb is not None:
            step = record.get("step")
            self._wandb.log(record, step=step)
