#!/usr/bin/env bash
# Rotation / erase visualisation (reference scripts/model_visualisation.sh).
set -e
CKPT=${CKPT:?set CKPT}
OUT=${OUT:-results/visualisation}
python scripts/inference_test_bench.py \
    --config configs/mobi_nusc_512.yaml --ckpt "$CKPT" \
    --outdir "$OUT/rotation" --rotation_test \
    --plms --ddim_steps 50 --scale 5 --n_samples 4 --seed 42 --fixed_code \
    --save_visualisations --save_samples
python scripts/inference_test_bench.py \
    --config configs/mobi_nusc_512.yaml --ckpt "$CKPT" \
    --outdir "$OUT/erase" \
    --plms --ddim_steps 50 --scale 5 --n_samples 4 --seed 42 \
    --save_visualisations --save_samples \
    ref_mode=erase-ref
