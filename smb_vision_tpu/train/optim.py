"""Optimizers and schedules (optax).

Covers the reference's optimizer surface:
- AdamW + cosine schedule with linear warmup (scripts/training/run_mim.sh:
  lr 5e-5 cosine, warmup_ratio 0.01, weight_decay 0.01)
- weight-decay exclusion for LayerNorm/bias params (the VisionTrainer
  decay-parameter logic, /root/reference/src/train/trainer.py:107-154)
- two-tier learning rate: backbone (vision_lr) vs head (merger_lr) param
  groups via optax.multi_transform (trainer.py:39-105 intent — that class
  was orphaned in the reference; it is first-class here)
"""

from __future__ import annotations

from typing import Optional

import jax
import optax


def _is_no_decay(path) -> bool:
    # HF Trainer.get_decay_parameter_names semantics (the stack the
    # reference trains through): ONLY biases and norm-layer params are
    # excluded from weight decay — mask/cls tokens, position tables, and
    # LayerScale lambdas ARE decayed there, so they are decayed here too
    # (verified end-to-end by tests/test_learning_equivalence.py).
    name = "/".join(str(getattr(p, "key", p)) for p in path).lower()
    # "/bn/": FrozenBatchNorm statistics (models/resnet3d.py) — frozen
    # params whose grads are stop_gradient'd zero, but add_decayed_weights
    # would still shrink them toward 0 every step without this exclusion
    return "bias" in name or "norm" in name or "/bn/" in name


def decay_mask(params):
    return jax.tree_util.tree_map_with_path(
        lambda p, _: not _is_no_decay(p), params)


def make_schedule(learning_rate: float, total_steps: int,
                  warmup_ratio: float = 0.0, warmup_steps: int = 0,
                  schedule: str = "cosine", min_lr: float = 0.0):
    import math

    # ceil, not floor: HF TrainingArguments.get_warmup_steps uses
    # math.ceil(num_training_steps * warmup_ratio) — at the reference
    # recipe's warmup_ratio=0.01 a short run floors to 0 warmup steps
    # while the reference stack gets 1, desynchronising every step's lr
    warmup = warmup_steps or math.ceil(total_steps * warmup_ratio)
    decay_steps = max(total_steps - warmup, 1)
    if schedule == "cosine":
        after = optax.cosine_decay_schedule(
            learning_rate, decay_steps, alpha=min_lr / learning_rate
            if learning_rate else 0.0)
    elif schedule == "linear":
        after = optax.linear_schedule(learning_rate, min_lr, decay_steps)
    elif schedule == "constant":
        after = optax.constant_schedule(learning_rate)
    else:
        raise ValueError(f"unknown schedule {schedule}")
    if warmup == 0:
        return after
    return optax.join_schedules(
        [optax.linear_schedule(0.0, learning_rate, warmup), after], [warmup])


def make_optimizer(*, learning_rate: float, total_steps: int,
                   weight_decay: float = 0.01, warmup_ratio: float = 0.0,
                   warmup_steps: int = 0, schedule: str = "cosine",
                   min_lr: float = 0.0, b1: float = 0.9, b2: float = 0.999,
                   eps: float = 1e-8, grad_clip: Optional[float] = 1.0,
                   vision_lr: Optional[float] = None,
                   merger_lr: Optional[float] = None,
                   head_regex: str = "classifier",
                   backbone_regex: str = "videomae|dinov2|vjepa2",
                   optim: str = "adamw"):
    """AdamW with cosine/linear warmup schedule.

    Two-tier fine-tuning (run_cls.sh:14-24) follows the reference's
    VisionTrainer.create_optimizer grouping EXACTLY
    (/root/reference/src/train/trainer.py:54-131):

    - ``merger_lr`` set: params matching ``head_regex`` ("classifier"
      in name, ref :63-64) train at merger_lr;
    - ``vision_lr`` set: params matching ``backbone_regex`` but NOT
      ``head_regex`` (ref :59-61: "videomae"/"dinov2" in name minus
      classifier; "vjepa2" added here for the third backbone family)
      train at vision_lr;
    - everything else — e.g. the fc_norm neck, ref :69-88 — stays at
      ``learning_rate``. This third tier is load-bearing: mapping neck
      params to vision_lr instead silently trains them at the wrong LR
      whenever vision_lr != learning_rate
      (tests/test_learning_equivalence.py::test_two_tier_lr_*).

    Either tier may be set alone, as in the reference (:58-64).

    optim="adamw8bit" stores the Adam moments as int8 blockwise-quantized
    state (the reference's bitsandbytes Adam8bit analog,
    ref trainer.py:155-167)."""

    def adamw(lr_sched):
        if optim == "adamw8bit":
            from smb_vision_tpu.train.quantized import adamw8bit

            return adamw8bit(lr_sched, b1=b1, b2=b2, eps=eps,
                             weight_decay=weight_decay, mask=decay_mask)
        elif optim == "adamw":
            return optax.adamw(lr_sched, b1=b1, b2=b2, eps=eps,
                               weight_decay=weight_decay, mask=decay_mask)
        raise ValueError(f"unknown optim {optim!r}")

    def clipped(tx):
        # clipping wraps the WHOLE transformation so the norm is the true
        # global norm — clipping inside each multi_transform group would
        # scale the head and the backbone by different factors (diverging
        # from HF max_grad_norm semantics whenever clipping is active)
        if grad_clip:
            return optax.chain(optax.clip_by_global_norm(grad_clip), tx)
        return tx

    if vision_lr is not None or merger_lr is not None:
        import re

        head_pat = re.compile(head_regex)
        back_pat = re.compile(backbone_regex)

        def label_one(path, _):
            name = "/".join(str(getattr(q, "key", q)) for q in path)
            if head_pat.search(name):
                # ref :59-61: the backbone rule excludes classifier names
                # unconditionally, so an unset merger_lr leaves head
                # params in the default group, never the vision group
                return "head" if merger_lr is not None else "default"
            if back_pat.search(name):
                return "vision" if vision_lr is not None else "default"
            return "default"

        def labels(params):
            return jax.tree_util.tree_map_with_path(label_one, params)

        def sched(lr):
            return make_schedule(lr, total_steps, warmup_ratio,
                                 warmup_steps, schedule, min_lr)

        tiers = {"default": adamw(sched(learning_rate))}
        if vision_lr is not None:
            tiers["vision"] = adamw(sched(vision_lr))
        if merger_lr is not None:
            tiers["head"] = adamw(sched(merger_lr))
        return clipped(optax.multi_transform(tiers, labels))

    return clipped(adamw(make_schedule(learning_rate, total_steps,
                                       warmup_ratio, warmup_steps,
                                       schedule, min_lr)))


def ema_update(teacher_params, student_params, momentum: float):
    """EMA target-encoder update (run_vjepa.py:87-98), applied ONCE per
    optimizer step inside the jitted train step (the reference ran it inside
    compute_loss — every micro-step and during eval; fixed here)."""
    return jax.tree_util.tree_map(
        lambda t, s: t * momentum + s.astype(t.dtype) * (1.0 - momentum),
        teacher_params, student_params)
