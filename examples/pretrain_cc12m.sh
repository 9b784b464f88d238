#!/usr/bin/env bash
# Production pre-training launch (reference run.sh:15-31 hyperparameters).
set -euo pipefail

DATA_DIR=${DATA_DIR:-data}
IMAGES_DIR=${IMAGES_DIR:-images}
OUTPUT_DIR=${OUTPUT_DIR:-runs/cc12m}
TOKENIZER=${TOKENIZER:?set TOKENIZER to a local mbart50 tokenizer dir}

python -m mic_tpu.cli.train \
    --train_file "$DATA_DIR/train_file.tsv" \
    --validation_file "$DATA_DIR/val_file.tsv" \
    --images_dir "$IMAGES_DIR" \
    --output_dir "$OUTPUT_DIR" \
    --tokenizer "$TOKENIZER" \
    --num_epochs 7 \
    --per_device_batch_size 64 \
    --learning_rate 5e-5 \
    --warmup_steps 1000 \
    --logging_steps 100 \
    --eval_steps 3000 \
    --save_steps 9000 \
    --save_total_limit 6 \
    --num_workers 16 \
    --max_seq_length 64 \
    --set model.dtype=bfloat16
