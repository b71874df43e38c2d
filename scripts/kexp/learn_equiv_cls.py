"""Learning-equivalence experiment: classification fine-tuning (CE and
Cox survival), this stack vs the reference stack (torch + HF Trainer).

Same design as learn_equiv_mim.py: our flax init exported into the stock
torch VideoMAEForVideoClassification, identical batches in the HF
Trainer's own sampling order, identical recipe, f32 both sides, per-step
loss trajectories + final params compared.

The Cox leg mirrors the reference's SurvivalTrainer
(/root/reference/src/run_classification.py:75-97): an HF Trainer subclass
whose compute_loss pops duration/event and applies the Cox partial
likelihood (sorted by descending duration, gamma-stabilised
log-cumsum-exp, mean over events) — the exact semantics of
train/losses.py::cox_loss, expressed in torch here so the torch side is
the reference stack end to end.

Usage: python learn_equiv_cls.py [ce|cox] [lr]
"""

import json
import sys
import tempfile

import numpy as np

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")

import jax.numpy as jnp
import optax
import torch

from smb_vision_tpu.models.configs import VideoMAEConfig
from smb_vision_tpu.models.convert import export_hf_videomae
from smb_vision_tpu.models.videomae import VideoMAEForVideoClassification
from smb_vision_tpu.train.classification import (
    make_classification_workload,
    problem_type_for,
)
from smb_vision_tpu.train.optim import make_optimizer

KW = dict(image_size=32, patch_size=8, num_channels=1, num_frames=16,
          tubelet_size=8, hidden_size=32, num_hidden_layers=2,
          num_attention_heads=2, intermediate_size=64)
N, B, EPOCHS = 8, 4, 15  # 30 optimizer steps
TASK = sys.argv[1] if len(sys.argv) > 1 else "ce"
RECIPE = dict(learning_rate=float(sys.argv[2]) if len(sys.argv) > 2
              else 1e-3, weight_decay=0.01, warmup_ratio=0.01,
              max_grad_norm=1.0)
NUM_LABELS = 1 if TASK == "cox" else 2


def torch_cox_loss(risk, durations, events, eps=1e-7):
    order = torch.argsort(-durations)
    log_h = risk[order].float().view(-1)
    ev = events[order].float().view(-1)
    gamma = log_h.max()
    log_cumsum = torch.log(torch.cumsum(torch.exp(log_h - gamma), 0)
                           + eps) + gamma
    return -torch.sum((log_h - log_cumsum) * ev) / (ev.sum() + eps)


def build_data():
    rng = np.random.default_rng(1)
    px = rng.normal(size=(N, KW["num_frames"], 1, KW["image_size"],
                          KW["image_size"])).astype(np.float32)
    if TASK == "cox":
        lab = {"duration": rng.uniform(1, 60, N).astype(np.float32),
               "event": (rng.uniform(size=N) > 0.3).astype(np.float32)}
        lab["event"][:2] = 1.0
    else:
        lab = {"labels": rng.integers(0, NUM_LABELS, N).astype(np.int64)}
    return px, lab


def run_torch(state_dict, px, lab, out_dir):
    from transformers import Trainer, TrainingArguments
    from transformers import VideoMAEConfig as HFConfig
    from transformers import VideoMAEForVideoClassification as HFModel

    hf = HFModel(HFConfig(num_labels=NUM_LABELS, use_mean_pooling=True,
                          **KW))
    missing, unexpected = hf.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in state_dict.items()}, strict=False)
    assert not unexpected, unexpected
    assert all("position_embeddings" in m for m in missing), missing
    hf = hf.float()

    order = []

    class DS(torch.utils.data.Dataset):
        def __len__(self):
            return N

        def __getitem__(self, i):
            order.append(int(i))
            item = {"pixel_values": torch.from_numpy(px[i])}
            for k, v in lab.items():
                item[k] = torch.tensor(v[i])
            return item

    class SurvivalTrainer(Trainer):
        """reference run_classification.py:75-97 semantics."""

        def compute_loss(self, model, inputs, return_outputs=False,
                         num_items_in_batch=None):
            durations = inputs.pop("duration")
            events = inputs.pop("event")
            outputs = model(**inputs)
            risk = outputs.logits.squeeze(-1)
            loss = torch_cox_loss(risk, durations, events)
            return (loss, outputs) if return_outputs else loss

    args = TrainingArguments(
        output_dir=out_dir, per_device_train_batch_size=B,
        num_train_epochs=EPOCHS, learning_rate=RECIPE["learning_rate"],
        lr_scheduler_type="cosine", weight_decay=RECIPE["weight_decay"],
        max_grad_norm=RECIPE["max_grad_norm"],
        warmup_ratio=RECIPE["warmup_ratio"], logging_steps=1,
        report_to=[], seed=0, dataloader_num_workers=0, use_cpu=True,
        remove_unused_columns=False, disable_tqdm=True, save_strategy="no")
    cls = SurvivalTrainer if TASK == "cox" else Trainer
    trainer = cls(model=hf, args=args, train_dataset=DS())
    trainer.train()
    losses = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    final = {k: v.detach().numpy().copy()
             for k, v in hf.state_dict().items()}
    return losses, order, final


def run_ours(px, lab, order):
    cfg = VideoMAEConfig(
        num_labels=NUM_LABELS, use_mean_pooling=True, dtype="float32",
        attn_impl="xla",
        problem_type=problem_type_for(
            "cox_regression" if TASK == "cox" else "classification",
            NUM_LABELS),
        **KW)
    model = VideoMAEForVideoClassification(cfg)
    total_steps = (N // B) * EPOCHS
    tx = make_optimizer(
        learning_rate=RECIPE["learning_rate"], total_steps=total_steps,
        weight_decay=RECIPE["weight_decay"],
        warmup_ratio=RECIPE["warmup_ratio"],
        grad_clip=RECIPE["max_grad_norm"], schedule="cosine")
    init_fn, step_fn, eval_fn = make_classification_workload(
        model, cfg,
        task_type="cox_regression" if TASK == "cox" else "classification",
        tx=tx)

    def mk_batch(idx):
        b = {"pixel_values": px[idx]}
        for k, v in lab.items():
            b[k] = v[idx]
        return b

    state = init_fn(jax.random.PRNGKey(0), mk_batch(np.arange(B)))
    jstep = jax.jit(step_fn)
    losses = []
    for s in range(total_steps):
        idx = np.asarray(order[s * B:(s + 1) * B])
        state, aux = jstep(state, mk_batch(idx), jax.random.PRNGKey(s))
        losses.append(float(aux["loss"]))
    return losses, state["params"]


def main():
    px, lab = build_data()
    # ours inits; export the SAME params into torch
    # (run_ours re-inits with the same key -> identical params)
    cfg = VideoMAEConfig(
        num_labels=NUM_LABELS, use_mean_pooling=True, dtype="float32",
        attn_impl="xla",
        problem_type=problem_type_for(
            "cox_regression" if TASK == "cox" else "classification",
            NUM_LABELS),
        **KW)
    model = VideoMAEForVideoClassification(cfg)
    tx0 = optax.sgd(0.0)
    init_fn, _, _ = make_classification_workload(
        model, cfg,
        task_type="cox_regression" if TASK == "cox" else "classification",
        tx=tx0)
    b0 = {"pixel_values": px[:B]}
    for k, v in lab.items():
        b0[k] = v[:B]
    params = init_fn(jax.random.PRNGKey(0), b0)["params"]
    state_dict = export_hf_videomae(params,
                                    num_layers=KW["num_hidden_layers"])

    with tempfile.TemporaryDirectory() as td:
        t_losses, order, t_final = run_torch(state_dict, px, lab, td)
    j_losses, j_params = run_ours(px, lab, order)

    t, j = np.asarray(t_losses), np.asarray(j_losses)
    k = min(len(t), len(j))
    # loss-scale floor: a no-event Cox batch logs loss 0.0 on both sides;
    # dividing by |t| there turns f32 dust into a huge "relative" diff
    scale = max(float(np.abs(t[:k]).max()), 1e-8)
    rel = np.abs(t[:k] - j[:k]) / np.maximum(np.abs(t[:k]), 1e-2 * scale)
    j_final = export_hf_videomae(j_params,
                                 num_layers=KW["num_hidden_layers"])
    pdiffs = {k2: float(np.max(np.abs(j_final[k2] - t_final[k2])) /
                        (float(np.max(np.abs(t_final[k2]))) + 1e-12))
              for k2 in j_final}
    pkey = max(pdiffs, key=pdiffs.get)
    pdiff = pdiffs[pkey]
    pabs = float(np.max(np.abs(j_final[pkey] - t_final[pkey])))
    pscale = float(np.max(np.abs(t_final[pkey])))
    print(json.dumps({
        "task": TASK, "steps": int(k),
        "torch_first3": t[:3].round(6).tolist(),
        "jax_first3": j[:3].round(6).tolist(),
        "torch_last3": t[-3:].round(6).tolist(),
        "jax_last3": j[-3:].round(6).tolist(),
        "max_rel_loss_diff": float(rel.max()),
        "final_rel_loss_diff": float(rel[-1]),
        "max_final_param_rel_diff": pdiff,
        "max_param_diff_key": pkey,
        "max_param_diff_abs": pabs,
        "max_param_key_scale": pscale,
        "loss_drop_torch": float(t[0] - t[-1]),
        "loss_drop_jax": float(j[0] - j[-1]),
    }))


if __name__ == "__main__":
    main()
