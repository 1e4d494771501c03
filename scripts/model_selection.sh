#!/usr/bin/env bash
# Checkpoint selection (reference scripts/model_selection.sh): run the bench
# + metrics for the top-k checkpoints, track-ref, 32 objects/class.
set -e
LOGDIR=${LOGDIR:?set LOGDIR to a training logdir}
CONFIG=${CONFIG:-configs/mobi_nusc_512.yaml}
OUT=${OUT:-results/model_selection}
for ckpt in "$LOGDIR"/checkpoints/*; do
    name=$(basename "$ckpt")
    python scripts/inference_test_bench.py \
        --config "$CONFIG" --ckpt "$ckpt" \
        --outdir "$OUT/$name" \
        --plms --ddim_steps 50 --scale 5 --n_samples 4 --seed 321 \
        --save_samples \
        ref_mode=track-ref \
        data.params.test.params.num_samples_per_class=32
done
