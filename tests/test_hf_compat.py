"""HF TrainingArguments flag compatibility (utils/args.py::_HF_COMPAT).

The reference's launch recipes (reference scripts/training/run_mim.sh:13-38,
run_cls.sh:32-66, run_vjepa.sh:16-43) pass HF-only flags (--bf16,
--eval_strategy, --remove_unused_columns, --cache_dir, ...). These must
port by swapping the entry point, not by debugging argparse errors: known
flags map to their equivalents here (loudly), no-ops are warned about,
and GPU-only requests fail with an actionable message.
"""

import dataclasses
import json

import pytest

from smb_vision_tpu.utils.args import parse_args_into_dataclasses


def _mim_classes():
    from smb_vision_tpu.cli.run_mim import DataTrainingArguments, ModelArguments
    from smb_vision_tpu.train.trainer import TrainingArguments

    return (DataTrainingArguments, ModelArguments, TrainingArguments)


# the literal reference MIM recipe flag surface (run_mim.sh:13-38) minus
# the HF-hub model id (hub pulls are a separate gated path)
MIM_RECIPE = [
    "--json_path", "/tmp/x.json", "--cache_dir", "/tmp/cache",
    "--lr_scheduler_type", "cosine", "--learning_rate", "5e-5",
    "--weight_decay", "0.01", "--max_grad_norm", "1.0",
    "--warmup_ratio", "0.01", "--num_train_epochs", "3",
    "--per_device_train_batch_size", "4",
    "--per_device_eval_batch_size", "1",
    "--gradient_accumulation_steps", "1",
    "--do_train", "true", "--do_eval", "true",
    "--overwrite_output_dir", "true",
    "--remove_unused_columns", "false",
    "--output_dir", "/tmp/out", "--eval_strategy", "no",
    "--eval_steps", "500", "--save_steps", "5000", "--bf16", "true",
    "--gradient_checkpointing", "true", "--logging_steps", "1",
    "--report_to", "wandb", "--run_name", "smb-vision-base",
]


def test_reference_mim_recipe_parses_verbatim():
    d, m, t = parse_args_into_dataclasses(_mim_classes(), MIM_RECIPE)
    assert d.cache_data_dir == "/tmp/cache"          # --cache_dir rename
    assert m.dtype == "bfloat16"                     # --bf16 true
    assert m.gradient_checkpointing is True
    # HF is promote-only: the recipe's explicit --do_eval true survives
    # --eval_strategy no (reference run_mim.py:452 gates a final
    # trainer.evaluate() on do_eval, which the ported recipe must run)
    assert t.do_eval is True
    assert t.learning_rate == 5e-5 and t.num_train_epochs == 3.0
    assert t.report_to == "wandb"


def test_eval_strategy_promotes_but_never_demotes():
    # strategy != 'no' promotes (argparse last-wins over --do_eval false,
    # matching HF post_init's do_eval = strategy != 'no' promotion)
    (_, _, t) = parse_args_into_dataclasses(
        _mim_classes(), ["--do_eval", "false", "--eval_strategy", "steps"])
    assert t.do_eval is True
    # strategy == 'no' is dropped: never demotes an explicit --do_eval true
    (_, _, t) = parse_args_into_dataclasses(
        _mim_classes(), ["--do_eval", "true", "--evaluation_strategy", "no"])
    assert t.do_eval is True
    # ... and without an explicit --do_eval, the default (False) stands
    (_, _, t) = parse_args_into_dataclasses(
        _mim_classes(), ["--evaluation_strategy", "no"])
    assert t.do_eval is False


def test_lr_scheduler_kwargs_maps_min_lr():
    # the V-JEPA recipe's cosine_with_min_lr kwargs (run_vjepa.sh:21-22)
    (_, _, t) = parse_args_into_dataclasses(
        _mim_classes(),
        ["--lr_scheduler_kwargs", '{"min_lr": 1e-07}'])
    assert t.min_lr == 1e-07


def test_lr_scheduler_kwargs_rejects_non_json():
    with pytest.raises(SystemExit):
        parse_args_into_dataclasses(
            _mim_classes(), ["--lr_scheduler_kwargs", "min_lr=1e-7"])


def test_fp16_fails_actionably():
    with pytest.raises(SystemExit, match="bfloat16"):
        parse_args_into_dataclasses(_mim_classes(), ["--fp16", "true"])
    with pytest.raises(SystemExit, match="bfloat16"):
        parse_args_into_dataclasses(_mim_classes(), ["--fp16"])


def test_fp16_false_is_a_noop():
    """`"fp16": false` is a near-universal disabled default in HF config
    dumps; only a truthy request for the GPU dtype is fatal."""
    d, m, t = parse_args_into_dataclasses(_mim_classes(), ["--fp16", "false"])
    assert m.dtype == "bfloat16"                     # default intact


def test_lr_scheduler_kwargs_rejects_non_object_json():
    # parses as JSON but is not an object -> same clean error, not a
    # raw AttributeError from list.items()
    with pytest.raises(SystemExit, match="JSON object"):
        parse_args_into_dataclasses(
            _mim_classes(), ["--lr_scheduler_kwargs", "[1, 2]"])


def test_value_taking_compat_flag_requires_value():
    # --cache_dir as the last token must not become the literal path
    # 'true'
    with pytest.raises(SystemExit, match="expects a value"):
        parse_args_into_dataclasses(_mim_classes(), ["--cache_dir"])
    with pytest.raises(SystemExit, match="expects a value"):
        parse_args_into_dataclasses(
            _mim_classes(), ["--cache_dir", "--do_train", "true"])
    # tristate takes a value too: a bare --eval_strategy must not absorb
    # 'true' and silently enable eval (HF argparse errors here as well)
    with pytest.raises(SystemExit, match="expects a value"):
        parse_args_into_dataclasses(_mim_classes(), ["--eval_strategy"])
    with pytest.raises(SystemExit, match="expects a value"):
        parse_args_into_dataclasses(
            _mim_classes(), ["--eval_strategy", "--do_train", "true"])


def test_bare_bool_and_equals_forms():
    (_, m, _) = parse_args_into_dataclasses(_mim_classes(), ["--bf16"])
    assert m.dtype == "bfloat16"
    (_, m, _) = parse_args_into_dataclasses(_mim_classes(), ["--bf16=true"])
    assert m.dtype == "bfloat16"
    # --bf16 false is a no-op, not a downgrade of the default
    (_, m, _) = parse_args_into_dataclasses(
        _mim_classes(), ["--bf16", "false", "--dtype", "float32"])
    assert m.dtype == "float32"


def test_real_fields_shadow_aliases():
    """An entry point that owns a field named like an HF alias must keep
    it: the compat table only fires for flags with no field here."""

    @dataclasses.dataclass
    class WithCacheDir:
        cache_dir: str = "default"

    (a,) = parse_args_into_dataclasses(
        (WithCacheDir,), ["--cache_dir", "/real/field"])
    assert a.cache_dir == "/real/field"


def test_ignored_flags_do_not_error():
    d, m, t = parse_args_into_dataclasses(
        _mim_classes(),
        ["--remove_unused_columns", "false", "--save_strategy", "steps",
         "--deepspeed", "ds.json", "--dataloader_pin_memory", "true",
         "--torch_compile", "false", "--tf32", "true",
         "--ddp_find_unused_parameters", "false",
         "--save_safetensors", "true", "--logging_strategy", "steps"])
    assert t.output_dir == "output"                  # defaults intact


def test_dataloader_num_workers_renames():
    (d, _, _) = parse_args_into_dataclasses(
        _mim_classes(), ["--dataloader_num_workers", "3"])
    assert d.num_workers == 3


def test_json_config_mode_applies_compat(tmp_path):
    blob = {"json_path": "/tmp/x.json", "bf16": True,
            "eval_strategy": "no", "remove_unused_columns": False,
            "learning_rate": 1e-4,
            "lr_scheduler_kwargs": {"min_lr": 1e-6}}
    p = tmp_path / "cfg.json"
    p.write_text(json.dumps(blob))
    d, m, t = parse_args_into_dataclasses(_mim_classes(), [str(p)])
    assert m.dtype == "bfloat16"
    assert t.do_eval is False
    assert t.min_lr == 1e-6
    assert t.learning_rate == 1e-4


def test_classification_recipe_surface():
    """run_cls.sh:32-66 flag set (minus hub id) parses end to end."""
    from smb_vision_tpu.cli.run_classification import (
        DataTrainingArguments,
        ModelArguments,
    )
    from smb_vision_tpu.train.trainer import TrainingArguments

    argv = [
        "--train_data_path", "d.parquet", "--val_data_path", "d.parquet",
        "--cache_dir", "/tmp/cache", "--task_type", "classification",
        "--num_labels", "2", "--label_columns", "histology_adc",
        "--additional_feature_columns", "age", "sex",
        "--lr_scheduler_type", "cosine", "--learning_rate", "1e-5",
        "--vision_lr", "1e-5", "--merger_lr", "3e-4",
        "--weight_decay", "1e-5", "--warmup_ratio", "0.01",
        "--num_train_epochs", "10",
        "--per_device_train_batch_size", "4",
        "--per_device_eval_batch_size", "4",
        "--gradient_accumulation_steps", "1",
        "--do_train", "true", "--do_eval", "true",
        "--overwrite_output_dir", "true",
        "--remove_unused_columns", "false",
        "--output_dir", "/tmp/out", "--eval_strategy", "steps",
        "--eval_steps", "2", "--save_strategy", "steps",
        "--save_steps", "2", "--save_total_limit", "3", "--bf16", "true",
    ]
    d, m, t = parse_args_into_dataclasses(
        (DataTrainingArguments, ModelArguments, TrainingArguments), argv)
    assert d.label_columns == ["histology_adc"]
    assert d.additional_feature_columns == ["age", "sex"]
    assert d.cache_data_dir == "/tmp/cache"
    assert t.vision_lr == 1e-5 and t.merger_lr == 3e-4
    assert t.do_eval is True and m.dtype == "bfloat16"
