#!/usr/bin/env bash
# Canonical fine-tuning recipe (parity with reference
# scripts/training/run_cls.sh:6-65: 224^2x160, vision_lr 1e-5,
# merger_lr 3e-4, wd 1e-5, bs 4, age+sex tabular features).
set -euo pipefail

TRAIN_JSON=${1:?usage: run_cls.sh <train.json> <val.json> <backbone.safetensors> [output_dir]}
VAL_JSON=${2:?}
BACKBONE=${3:?}
OUTPUT_DIR=${4:-output/cls}

python -m smb_vision_tpu.cli.run_classification \
    --train_data_path "$TRAIN_JSON" \
    --val_data_path "$VAL_JSON" \
    --model_name_or_path "$BACKBONE" \
    --output_dir "$OUTPUT_DIR" \
    --task_type classification --num_labels 2 \
    --additional_feature_columns age sex \
    --image_size 224 --depth 160 --patch_size 16 \
    --dtype bfloat16 \
    --per_device_train_batch_size 4 \
    --vision_lr 1e-5 --merger_lr 3e-4 --weight_decay 1e-5 \
    --lr_scheduler_type cosine --warmup_ratio 0.01 \
    --num_train_epochs 20 --eval_steps 100 \
    --logging_steps 10 --save_steps 200 --save_total_limit 3 \
    --do_eval true \
    --cache_data_dir "$OUTPUT_DIR/data_cache" \
    "${@:5}"
