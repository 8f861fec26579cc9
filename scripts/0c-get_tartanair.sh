#!/bin/bash
# Download the TartanAir scenes used for zero-shot evaluation.
# Parity: reference scripts/0c-get_tartanair.sh (gascola, winter forest,
# neighborhood, old town — Easy, left camera + depth).
set -e
target="${1:-$(dirname "$0")/../datasets/TartanAir}"
mkdir -p "$target"

base="https://tartanair.blob.core.windows.net/tartanair-release1"
for scene in gascola seasonsforest_winter neighborhood oldtown; do
  for kind in image_left depth_left; do
    url="$base/$scene/Easy/${kind}.zip"
    echo "fetching $url"
    wget -c "$url" -P "$target/$scene/Easy/"
    unzip -o "$target/$scene/Easy/${kind}.zip" -d "$target"
    rm -f "$target/$scene/Easy/${kind}.zip"
  done
done
