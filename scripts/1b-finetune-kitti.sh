#!/bin/bash
# Finetune on KITTI (joint 50/50 KITTI + Mid-Air stream, velodyne loss).
# Parity: reference scripts/1b-finetune-kitti.sh — promote the best Mid-Air
# checkpoint into the finetune train dir, then finetune.
set -e
cd "$(dirname "$0")/.."

src="ckpt/midair-d6"
savepath="ckpt/kitti-finetune-d6"

mkdir -p "$savepath"
if [ -d "$src/best" ] && [ ! -d "$savepath/train" ]; then
    # Re-save best's ledger winner under the train manager's step naming
    # (a plain cp -r would leave a layout latest_step() can't see and
    # finetuning would silently start from scratch).
    python -m m4depth_tpu.cli.main --mode=promote \
        --ckpt_dir="$src" --promote_dest="$savepath" --arch_depth=6
fi

python -m m4depth_tpu.cli.finetune_kitti \
    --records_path=data \
    --ckpt_dir="$savepath" \
    --seq_len=4 --arch_depth=6 \
    --enable_validation "$@"
