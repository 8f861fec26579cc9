#!/bin/bash
# Evaluate pretrained weights on a dataset.
# Parity: reference scripts/2-evaluate.sh — per-dataset eval protocol:
#   midair/tartanair: frame-at-a-time streaming; kitti: 4-frame windows.
# Usage: ./2-evaluate.sh <midair|tartanair|kitti> [ckpt_dir]
set -e
cd "$(dirname "$0")/.."

dataset="$1"
weights="${2:-ckpt/midair-d6}"

case "$dataset" in
  midair)
    python -m m4depth_tpu.cli.main --mode=eval --dataset=midair \
        --records_path=data/midair/test_data \
        --ckpt_dir="$weights" --arch_depth=6 ;;
  tartanair)
    python -m m4depth_tpu.cli.main --mode=eval --dataset=tartanair \
        --records_path=data/tartanair/test_data \
        --ckpt_dir="$weights" --arch_depth=6 ;;
  kitti)
    python -m m4depth_tpu.cli.main --mode=eval --dataset=kitti-raw \
        --records_path=data/kitti-raw-filtered/test_data \
        --ckpt_dir="$weights" --arch_depth=6 --db_seq_len=4 --seq_len=4 ;;
  *)
    echo "usage: $0 <midair|tartanair|kitti> [ckpt_dir]"; exit 1 ;;
esac
