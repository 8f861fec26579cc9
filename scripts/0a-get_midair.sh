#!/bin/bash
# Download the Mid-Air segments needed for training/eval.
# Parity: reference scripts/0a-get_midair.sh. Requires a download_config
# file obtained from https://midair.ulg.ac.be/download.html covering the
# Kite_training + PLE_training left RGB and stereo disparity sensors.
# Usage: ./0a-get_midair.sh <download_config_file> [target_dir]
set -e

config="$1"
target="${2:-$(dirname "$0")/../datasets/MidAir}"
[ -f "$config" ] || { echo "usage: $0 <download_config> [target_dir]"; exit 1; }

mkdir -p "$target"
wget --content-disposition -x -nH -i "$config" -P "$target"
find "$target" -name "*.zip" -print -execdir unzip -o {} \; -delete

echo "Generating CSV manifests..."
python "$(dirname "$0")/midair-split-generator.py" --db_path "$target"
