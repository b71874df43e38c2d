#!/usr/bin/env bash
# Canonical V-JEPA2 pretraining recipe (parity with reference
# scripts/training/run_vjepa.sh:16-42: 384^2x256 @ spacing (1,1,1.5),
# bs 16/device, grad-accum 4, lr 3e-5 cosine -> 1e-7, EMA 0.99925, bf16).
set -euo pipefail

DATA_JSON=${1:?usage: run_vjepa.sh <data.json> [output_dir]}
OUTPUT_DIR=${2:-output/vjepa}

python -m smb_vision_tpu.cli.run_vjepa \
    --data_path "$DATA_JSON" \
    --output_dir "$OUTPUT_DIR" \
    --image_size 384 --depth 256 --patch_size 16 \
    --hidden_size 1024 --num_hidden_layers 24 --num_attention_heads 16 \
    --pred_hidden_size 384 --pred_num_hidden_layers 12 \
    --pred_num_attention_heads 12 \
    --ema_momentum 0.99925 \
    --dtype bfloat16 --gradient_checkpointing true \
    --per_device_train_batch_size 16 --gradient_accumulation_steps 4 \
    --learning_rate 3e-5 --lr_scheduler_type cosine --min_lr 1e-7 \
    --weight_decay 0.01 --warmup_ratio 0.01 \
    --num_train_epochs 100 \
    --logging_steps 10 --save_steps 500 --save_total_limit 3 \
    --sharding_policy fsdp \
    --cache_data_dir "$OUTPUT_DIR/data_cache" \
    "${@:3}"
