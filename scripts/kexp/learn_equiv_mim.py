"""Learning-equivalence experiment: MIM pretraining, this stack vs the
reference stack (torch + HF Trainer), identical init / data / masks /
recipe (lr 5e-5 cosine, warmup_ratio 0.01, wd 0.01, clip 1.0 — the
reference recipe, /root/reference/scripts/training/run_mim.sh:13-38).

Our flax init is exported with export_hf_videomae and loaded into the
stock torch VideoMAEForPreTraining (the reference's model is vendored HF
VideoMAE; matching HF IS matching the reference —
/root/reference/src/run_mim.py:429-449 trains it through HF Trainer).
Both sides then train N steps in f32 on the same batches in the same
order, and the per-step loss trajectories + final params are compared.

Jointly validates what the unit goldens cannot: AdamW eps/wd coupling,
the wd-exclusion set, clip ordering, warmup rounding, cosine shape, and
the masked-loss path, all composed over many steps.
"""

import json
import os
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
from smb_vision_tpu.models.videomae import VideoMAEForPreTraining
from smb_vision_tpu.ops.masking import mim_mask, num_masked_tokens
from smb_vision_tpu.train.optim import make_optimizer
from smb_vision_tpu.train.trainer import train_state

KW = dict(image_size=32, patch_size=8, num_channels=1, num_frames=16,
          tubelet_size=8, hidden_size=32, num_hidden_layers=2,
          num_attention_heads=2, intermediate_size=64)
DEC = dict(decoder_hidden_size=24, decoder_num_hidden_layers=1,
           decoder_num_attention_heads=2, decoder_intermediate_size=48)
N, B, EPOCHS = 8, 4, 25  # 2 steps/epoch * 25 = 50 optimizer steps
MASK_PATCH, MASK_RATIO = 16, 0.5
# reference recipe (run_mim.sh); pass a float argv[1] to raise the lr so
# the trajectory moves hard (amplifies any wd/clip/schedule mismatch)
RECIPE = dict(learning_rate=float(sys.argv[1]) if len(sys.argv) > 1
              else 5e-5, weight_decay=0.01, warmup_ratio=0.01,
              max_grad_norm=1.0)


def build_data():
    """N volumes + per-sample exact-count masks (ours — mim_mask — shipped
    to BOTH stacks so the mask path is part of the comparison)."""
    rng = np.random.default_rng(0)
    px = rng.normal(size=(N, KW["num_frames"], 1, KW["image_size"],
                          KW["image_size"])).astype(np.float32)
    masks = np.asarray(mim_mask(
        jax.random.PRNGKey(7), N, input_size=KW["image_size"],
        depth=KW["num_frames"], mask_patch_size=MASK_PATCH,
        model_patch_size=KW["patch_size"], mask_ratio=MASK_RATIO))
    return px, masks


def run_torch(state_dict, px, masks, out_dir):
    from transformers import Trainer, TrainingArguments
    from transformers import VideoMAEConfig as HFConfig
    from transformers import VideoMAEForPreTraining as HFModel

    hf = HFModel(HFConfig(norm_pix_loss=True, **KW, **DEC))
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
            return {"pixel_values": torch.from_numpy(px[i]),
                    "bool_masked_pos": torch.from_numpy(masks[i])}

    args = TrainingArguments(
        output_dir=out_dir, per_device_train_batch_size=B,
        num_train_epochs=EPOCHS, learning_rate=RECIPE["learning_rate"],
        lr_scheduler_type="cosine", weight_decay=RECIPE["weight_decay"],
        max_grad_norm=RECIPE["max_grad_norm"],
        warmup_ratio=RECIPE["warmup_ratio"], logging_steps=1,
        report_to=[], seed=0, dataloader_num_workers=0, use_cpu=True,
        remove_unused_columns=False, disable_tqdm=True, save_strategy="no")
    trainer = Trainer(model=hf, args=args, train_dataset=DS())
    trainer.train()
    losses = [h["loss"] for h in trainer.state.log_history if "loss" in h]
    final = {k: v.detach().numpy().copy()
             for k, v in hf.state_dict().items()}
    return losses, order, final


def run_ours(params, px, masks, order):
    cfg = VideoMAEConfig(norm_pix_loss=True, dtype="float32",
                         attn_impl="xla", **KW, **DEC)
    model = VideoMAEForPreTraining(cfg)
    n_masked = int(masks[0].sum())
    total_steps = (N // B) * EPOCHS
    tx = make_optimizer(
        learning_rate=RECIPE["learning_rate"], total_steps=total_steps,
        weight_decay=RECIPE["weight_decay"],
        warmup_ratio=RECIPE["warmup_ratio"],
        grad_clip=RECIPE["max_grad_norm"], schedule="cosine")
    state = train_state(params, tx.init(params))

    def loss_fn(p, bpx, bmask):
        out = model.apply(p, bpx, bmask, n_masked)
        return out["loss"]

    @jax.jit
    def step(state, bpx, bmask):
        loss, grads = jax.value_and_grad(loss_fn)(state["params"], bpx,
                                                  bmask)
        updates, opt_state = tx.update(grads, state["opt_state"],
                                       state["params"])
        new = dict(state)
        new.update(params=optax.apply_updates(state["params"], updates),
                   opt_state=opt_state, step=state["step"] + 1)
        return new, loss

    losses = []
    assert len(order) == total_steps * B, (len(order), total_steps, B)
    for s in range(total_steps):
        idx = order[s * B:(s + 1) * B]
        new_state, loss = step(state, jnp.asarray(px[idx]),
                               jnp.asarray(masks[idx]))
        state = new_state
        losses.append(float(loss))
    return losses, state["params"]


def main():
    px, masks = build_data()
    cfg = VideoMAEConfig(norm_pix_loss=True, dtype="float32",
                         attn_impl="xla", **KW, **DEC)
    model = VideoMAEForPreTraining(cfg)
    n_masked = num_masked_tokens(KW["image_size"], KW["num_frames"],
                                 MASK_PATCH, KW["patch_size"], MASK_RATIO)
    params = jax.jit(model.init, static_argnums=(3,))(
        jax.random.PRNGKey(0), jnp.asarray(px[:1]),
        jnp.asarray(masks[:1]), n_masked)

    state_dict = export_hf_videomae(
        params, num_layers=KW["num_hidden_layers"],
        decoder_layers=DEC["decoder_num_hidden_layers"])

    with tempfile.TemporaryDirectory() as td:
        t_losses, order, t_final = run_torch(state_dict, px, masks, td)
    j_losses, j_params = run_ours(params, px, masks, order)

    t = np.asarray(t_losses)
    j = np.asarray(j_losses)
    k = min(len(t), len(j))
    rel = np.abs(t[:k] - j[:k]) / np.maximum(np.abs(t[:k]), 1e-8)
    # final-params agreement (exported again for name alignment)
    j_final = export_hf_videomae(
        j_params, num_layers=KW["num_hidden_layers"],
        decoder_layers=DEC["decoder_num_hidden_layers"])
    pdiff = max(float(np.max(np.abs(j_final[k2] - t_final[k2])) /
                      (float(np.max(np.abs(t_final[k2]))) + 1e-12))
                for k2 in j_final)
    print(json.dumps({
        "steps": int(k),
        "torch_first5": t[:5].round(6).tolist(),
        "jax_first5": j[:5].round(6).tolist(),
        "torch_last5": t[-5:].round(6).tolist(),
        "jax_last5": j[-5:].round(6).tolist(),
        "max_rel_loss_diff": float(rel.max()),
        "rel_at_step": int(rel.argmax()),
        "final_rel_loss_diff": float(rel[-1]),
        "max_final_param_rel_diff": pdiff,
        "loss_drop_torch": float(t[0] - t[-1]),
        "loss_drop_jax": float(j[0] - j[-1]),
    }))


if __name__ == "__main__":
    main()
