"""Learning-equivalence experiment: V-JEPA2 pretraining, this stack vs
the reference stack (torch + HF Trainer with the reference's custom
compute_loss), identical init / data / masks / recipe (lr 3e-5
cosine_with_min_lr min_lr=1e-7, warmup_ratio 0.01, wd 0.01, clip 1.0 —
/root/reference/scripts/training/run_vjepa.sh:16-43).

The torch side re-creates the reference's VJEPATrainer semantics
(/root/reference/src/run_vjepa.py:87-141): an EMA target encoder
(deepcopy at t0, momentum 0.99925), L1 between the predictor output and
the no-grad teacher's target tokens, and the EMA update running inside
compute_loss — i.e. with the PRE-optimizer-step student params. The jax
side here mirrors that ordering exactly so the comparison isolates the
numerics; the production trainer (train/vjepa.py) deliberately differs
in two documented ways (per-sample masks; EMA once per optimizer step,
after the update) that are out of scope for this experiment — both
sides ship the SAME per-sample index masks, and grad_accum=1 keeps the
reference's per-micro-step EMA at one update per step.

Jointly validates what the forward goldens cannot: the
cosine_with_min_lr schedule shape, AdamW wd-exclusion over the VJEPA2
param names (mask_tokens decayed, norms/biases not), clip ordering, the
gathered-predictor L1 path, and the EMA arithmetic composed over many
steps.
"""

import copy
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

from smb_vision_tpu.models.configs import VJEPA2Config
from smb_vision_tpu.models.convert import export_hf_vjepa2
from smb_vision_tpu.models.vjepa import VJEPA2Model
from smb_vision_tpu.train.optim import ema_update, make_optimizer
from smb_vision_tpu.train.trainer import train_state

KW = dict(patch_size=8, crop_size=32, frames_per_clip=16, tubelet_size=8,
          in_chans=1, hidden_size=48, num_attention_heads=2,
          num_hidden_layers=2, pred_hidden_size=24,
          pred_num_attention_heads=2, pred_num_hidden_layers=2,
          pred_num_mask_tokens=4)
N, B, EPOCHS = 8, 4, 25           # 2 steps/epoch * 25 = 50 optimizer steps
N_TGT = 8                          # of 32 tokens; context = the other 24
EMA_MOMENTUM = 0.99925             # run_vjepa.py:107
RECIPE = dict(learning_rate=float(sys.argv[1]) if len(sys.argv) > 1
              else 3e-5, weight_decay=0.01, warmup_ratio=0.01,
              max_grad_norm=1.0, min_lr=1e-7)


def build_data(seq_len):
    """N volumes + per-sample disjoint context/target index masks with
    exact static counts, shipped verbatim to BOTH stacks."""
    rng = np.random.default_rng(0)
    px = rng.normal(size=(N, KW["frames_per_clip"], 1, KW["crop_size"],
                          KW["crop_size"])).astype(np.float32)
    perms = np.stack([rng.permutation(seq_len) for _ in range(N)])
    tgt = np.sort(perms[:, :N_TGT], axis=1).astype(np.int64)
    ctx = np.sort(perms[:, N_TGT:], axis=1).astype(np.int64)
    return px, ctx, tgt


def run_torch(state_dict, px, ctx, tgt, out_dir):
    from transformers import Trainer, TrainingArguments
    from transformers import VJEPA2Config as HFConfig
    from transformers import VJEPA2Model as HFModel

    hf = HFModel(HFConfig(**KW))
    missing, unexpected = hf.load_state_dict(
        {k: torch.from_numpy(np.ascontiguousarray(v))
         for k, v in state_dict.items()}, strict=False)
    assert not unexpected, unexpected
    assert not missing, missing
    hf = hf.float()

    order = []

    class DS(torch.utils.data.Dataset):
        def __len__(self):
            return N

        def __getitem__(self, i):
            order.append(int(i))
            return {"px": torch.from_numpy(px[i]),
                    "ctx": torch.from_numpy(ctx[i]),
                    "tgt": torch.from_numpy(tgt[i])}

    def collate(examples):
        return {
            "pixel_values_videos": torch.stack([e["px"] for e in examples]),
            "context_mask": [torch.stack([e["ctx"] for e in examples])],
            "target_mask": [torch.stack([e["tgt"] for e in examples])],
        }

    class VJEPATrainer(Trainer):
        """Reference VJEPATrainer semantics (run_vjepa.py:101-141):
        predictor vs no-grad EMA teacher, L1, EMA updated inside
        compute_loss with the pre-step student params."""

        def __init__(self, *args, **kwargs):
            super().__init__(*args, **kwargs)
            self.target_encoder = copy.deepcopy(self.model)
            for p in self.target_encoder.parameters():
                p.requires_grad = False

        def compute_loss(self, model, inputs, return_outputs=False,
                         num_items_in_batch=None):
            out = model(pixel_values_videos=inputs["pixel_values_videos"],
                        context_mask=inputs["context_mask"],
                        target_mask=inputs["target_mask"],
                        skip_predictor=False)
            with torch.no_grad():
                t_out = self.target_encoder(
                    pixel_values_videos=inputs["pixel_values_videos"],
                    context_mask=inputs["context_mask"],
                    target_mask=inputs["target_mask"], skip_predictor=True)
                # upstream transformers exposes target_hidden_state only on
                # the predictor output; the reference's vendored model
                # returns it on the skip-predictor output too
                # (modeling_vjepa.py target_hidden_state == gathered
                # encoder tokens) — gather it the same way here
                tm = inputs["target_mask"][0]
                teacher_tokens = torch.take_along_dim(
                    t_out.last_hidden_state,
                    tm.unsqueeze(-1).expand(-1, -1,
                                            t_out.last_hidden_state.shape[-1]),
                    dim=1)
                for pt, ps in zip(self.target_encoder.parameters(),
                                  model.parameters()):
                    pt.data.mul_(EMA_MOMENTUM).add_(
                        ps.data, alpha=1.0 - EMA_MOMENTUM)
            loss = torch.nn.functional.l1_loss(
                out.predictor_output.last_hidden_state, teacher_tokens)
            return (loss, out) if return_outputs else loss

    args = TrainingArguments(
        output_dir=out_dir, per_device_train_batch_size=B,
        num_train_epochs=EPOCHS, learning_rate=RECIPE["learning_rate"],
        lr_scheduler_type="cosine_with_min_lr",
        lr_scheduler_kwargs={"min_lr": RECIPE["min_lr"]},
        weight_decay=RECIPE["weight_decay"],
        max_grad_norm=RECIPE["max_grad_norm"],
        warmup_ratio=RECIPE["warmup_ratio"], logging_steps=1,
        report_to=[], seed=0, dataloader_num_workers=0, use_cpu=True,
        remove_unused_columns=False, disable_tqdm=True, save_strategy="no")
    trainer = VJEPATrainer(model=hf, args=args, train_dataset=DS(),
                           data_collator=collate)
    trainer.train()
    losses = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    final = {k: v.detach().numpy().copy()
             for k, v in hf.state_dict().items()}
    teacher = {k: v.detach().numpy().copy()
               for k, v in trainer.target_encoder.state_dict().items()}
    return losses, order, final, teacher


def run_ours(params, px, ctx, tgt, order):
    cfg = VJEPA2Config(dtype="float32", attn_impl="xla", **KW)
    model = VJEPA2Model(cfg)
    total_steps = (N // B) * EPOCHS
    tx = make_optimizer(
        learning_rate=RECIPE["learning_rate"], total_steps=total_steps,
        weight_decay=RECIPE["weight_decay"],
        warmup_ratio=RECIPE["warmup_ratio"],
        grad_clip=RECIPE["max_grad_norm"], schedule="cosine",
        min_lr=RECIPE["min_lr"])
    state = train_state(params, tx.init(params),
                        teacher=jax.tree_util.tree_map(jnp.copy, params))

    def loss_fn(p, teacher, bpx, bctx, btgt):
        out = model.apply(p, bpx, context_mask=[bctx], target_mask=[btgt])
        t = model.apply(teacher, bpx, context_mask=[bctx],
                        target_mask=[btgt], skip_predictor=True)
        return jnp.mean(jnp.abs(
            out["predictor_output"] -
            jax.lax.stop_gradient(t["target_hidden_state"])))

    @jax.jit
    def step(state, bpx, bctx, btgt):
        loss, grads = jax.value_and_grad(loss_fn)(
            state["params"], state["teacher"], bpx, bctx, btgt)
        # reference ordering: the EMA mixes the PRE-step student params
        # (update inside compute_loss, before optimizer.step —
        # run_vjepa.py:136-141)
        teacher = ema_update(state["teacher"], state["params"],
                             EMA_MOMENTUM)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        new = dict(state)
        new.update(params=optax.apply_updates(state["params"], updates),
                   opt_state=opt_state, teacher=teacher,
                   step=state["step"] + 1)
        return new, loss

    losses = []
    assert len(order) == total_steps * B, (len(order), total_steps, B)
    for s in range(total_steps):
        idx = order[s * B:(s + 1) * B]
        state, loss = step(state, jnp.asarray(px[idx]),
                           jnp.asarray(ctx[idx]), jnp.asarray(tgt[idx]))
        losses.append(float(loss))
    return losses, state["params"], state["teacher"]


def _export(params):
    return export_hf_vjepa2(params, num_layers=KW["num_hidden_layers"],
                            pred_layers=KW["pred_num_hidden_layers"])


def _max_rel(a: dict, b: dict) -> float:
    return max(float(np.max(np.abs(a[k] - b[k])) /
                     (float(np.max(np.abs(b[k]))) + 1e-12)) for k in a)


def main():
    cfg = VJEPA2Config(dtype="float32", attn_impl="xla", **KW)
    model = VJEPA2Model(cfg)
    px, ctx, tgt = build_data(cfg.seq_len)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), jnp.asarray(px[:1]),
        context_mask=[jnp.asarray(ctx[:1])],
        target_mask=[jnp.asarray(tgt[:1])])

    with tempfile.TemporaryDirectory() as td:
        t_losses, order, t_final, t_teacher = run_torch(
            _export(params), px, ctx, tgt, td)
    j_losses, j_params, j_teacher = run_ours(params, px, ctx, tgt, order)

    t, j = np.asarray(t_losses), np.asarray(j_losses)
    k = min(len(t), len(j))
    rel = np.abs(t[:k] - j[:k]) / np.maximum(np.abs(t[:k]), 1e-8)
    print(json.dumps({
        "steps": int(k),
        "torch_first5": t[:5].round(6).tolist(),
        "jax_first5": j[:5].round(6).tolist(),
        "torch_last5": t[-5:].round(6).tolist(),
        "jax_last5": j[-5:].round(6).tolist(),
        "max_rel_loss_diff": float(rel.max()),
        "rel_at_step": int(rel.argmax()),
        "final_rel_loss_diff": float(rel[-1]),
        "max_final_param_rel_diff": _max_rel(_export(j_params), t_final),
        "max_final_teacher_rel_diff": _max_rel(_export(j_teacher),
                                               t_teacher),
        "loss_drop_torch": float(t[0] - t[-1]),
        "loss_drop_jax": float(j[0] - j[-1]),
    }))


if __name__ == "__main__":
    main()
