#!/usr/bin/env bash
# Edited-scene generation for downstream detection eval (reference
# scripts/detection_generate.sh): 200 objects/class, dumps edited camera
# frames + point clouds + objects.json for the detector.
set -e
CKPT=${CKPT:?set CKPT}
OUT=${OUT:-results/detection}
python scripts/inference_test_bench.py \
    --config configs/mobi_nusc_512.yaml --ckpt "$CKPT" \
    --outdir "$OUT" \
    --plms --ddim_steps 50 --scale 5 --n_samples 4 --seed 321 \
    --save_samples \
    ref_mode=track-ref \
    data.params.test.params.num_samples_per_class=200 \
    data.params.test.params.sample_each_frame=True \
    data.params.test.params.object_meta_dump_path="$OUT/objects.json"
