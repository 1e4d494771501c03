#!/usr/bin/env bash
# Offline preprocessing (reference scripts/process_data.sh ->
# bevfusion/tools/create_data.py --pbe-database).
set -e
DATAROOT=${DATAROOT:-data/nuscenes}
VERSION=${VERSION:-v1.0-trainval}
OUT=${OUT:-processed-data/nuscenes}
for split in train val; do
    python -m mobi_tpu.data.preprocess \
        --dataroot "$DATAROOT" --version "$VERSION" \
        --out-dir "$OUT" --split "$split"
done
