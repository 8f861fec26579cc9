#!/bin/bash
# Train M4Depth-TPU from scratch on Mid-Air.
# Parity: reference scripts/1a-train-midair.sh (seq 4, db_seq 8, depth 6,
# per-epoch KITTI validation feeding the best-checkpoint manager).
set -e
cd "$(dirname "$0")/.."

savepath="ckpt/midair-d6"
python -m m4depth_tpu.cli.main \
    --mode=train --dataset=midair \
    --records_path=data/midair/train_data \
    --ckpt_dir="$savepath" \
    --seq_len=4 --db_seq_len=8 --arch_depth=6 \
    --enable_validation "$@"
