"""Training CLI (reference surface: run.sh + main.py HF-flag stack).

Example:
    python -m mic_tpu.cli.train \
        --train_file data/train.tsv --validation_file data/val.tsv \
        --images_dir images/ --output_dir runs/cc12m \
        --num_epochs 7 --per_device_batch_size 64 --warmup_steps 1000 \
        --eval_steps 3000 --save_steps 9000 --save_total_limit 6 \
        --tokenizer path/to/mbart50_tokenizer \
        --set model.dtype=bfloat16 --set decoder.dropout=0.1
"""

from __future__ import annotations

import argparse
import dataclasses

from mic_tpu.core.config import (
    CaptionerConfig,
    DataConfig,
    TrainConfig,
    apply_dotted_overrides,
)


def add_dataclass_args(parser: argparse.ArgumentParser, cls, skip=()) -> None:
    for f in dataclasses.fields(cls):
        if f.name in skip or not isinstance(
            f.default, (int, float, str, bool, type(None))
        ):
            continue
        kw = {}
        if isinstance(f.default, bool):
            kw = {"type": lambda s: s.lower() in ("1", "true", "yes")}
        elif f.default is None:
            kw = {"type": str}
        else:
            kw = {"type": type(f.default)}
        parser.add_argument(f"--{f.name}", default=f.default, **kw)


def collect(cls, args) -> dict:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in vars(args).items() if k in names and v is not None}


def build_configs(argv=None):
    parser = argparse.ArgumentParser(description=__doc__)
    add_dataclass_args(parser, DataConfig)
    add_dataclass_args(parser, TrainConfig)
    parser.add_argument("--tokenizer", type=str, default=None,
                        help="local HF tokenizer dir or SimpleTokenizer json")
    parser.add_argument("--model_config", type=str, default=None,
                        help="path to a CaptionerConfig json (default: flagship)")
    parser.add_argument("--set", action="append", default=[],
                        metavar="model.KEY=VALUE",
                        help="dotted model-config override, repeatable")
    args = parser.parse_args(argv)

    if args.model_config:
        model_config = CaptionerConfig.from_json(args.model_config)
    else:
        model_config = CaptionerConfig.clip_vit_b32_mbart50()
    overrides = {}
    for item in args.set:
        key, _, value = item.partition("=")
        overrides[key.removeprefix("model.")] = value
    if overrides:
        model_config = apply_dotted_overrides(model_config, overrides)

    data_config = DataConfig(**collect(DataConfig, args))
    train_config = TrainConfig(**collect(TrainConfig, args))
    return model_config, data_config, train_config, args


def main(argv=None):
    model_config, data_config, train_config, args = build_configs(argv)
    # multi-host: must run before the first backend touch (Trainer builds a
    # mesh over jax.devices()). No-op unless the env opts in.
    from mic_tpu.parallel.distributed import initialize_from_env

    initialize_from_env()
    from mic_tpu.train.trainer import Trainer

    trainer = Trainer(
        model_config, data_config, train_config, tokenizer_path=args.tokenizer
    )
    trainer.train()


if __name__ == "__main__":
    main()
