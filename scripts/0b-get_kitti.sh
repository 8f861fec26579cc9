#!/bin/bash
# Download the KITTI raw drives + annotated depth maps used by the
# KITTI-raw-filtered splits.
# Parity: reference scripts/0b-get_kitti.sh (raw synced drives + the
# data_depth_annotated archive).
set -e
target="${1:-$(dirname "$0")/../datasets/kitti-raw}"
mkdir -p "$target"

base="https://s3.eu-central-1.amazonaws.com/avg-kitti"

echo "Fetching annotated depth maps..."
wget -c "$base/data_depth_annotated.zip" -P "$target"
unzip -o "$target/data_depth_annotated.zip" -d "$target"
rm -f "$target/data_depth_annotated.zip"

# Drives referenced by the filtered split manifests (Eigen split coverage).
drives=$(sed -n 's/.*\(2011_[0-9_]*_drive_[0-9]*\)_sync.*/\1/p' \
          "$(dirname "$0")/../data/kitti-raw-filtered"/*/*.csv 2>/dev/null | sort -u)
for d in $drives; do
  date_dir=${d:0:10}
  echo "Fetching $d..."
  wget -c "$base/raw_data/${d}/${d}_sync.zip" -P "$target"
  unzip -o "$target/${d}_sync.zip" -d "$target"
  rm -f "$target/${d}_sync.zip"
  wget -nc "$base/raw_data/${date_dir}_calib.zip" -P "$target" || true
  unzip -n "$target/${date_dir}_calib.zip" -d "$target" 2>/dev/null || true
done
