#!/usr/bin/env bash
# Checkpoint selection (reference scripts/model_selection.sh): run the bench
# + metrics for the top-k checkpoints, track-ref, 32 objects/class.
set -e
LOGDIR=${LOGDIR:?set LOGDIR to a training logdir}
CONFIG=${CONFIG:-configs/mobi_nusc_512.yaml}
OUT=${OUT:-results/model_selection}
PYTHON=${PYTHON:-python}
N_PER_CLASS=${N_PER_CLASS:-32}
# EXTRA_OVERRIDES / MAX_BATCHES: see realism_test_bench.sh (smoke drives)
for ckpt in "$LOGDIR"/checkpoints/*; do
    name=$(basename "$ckpt")
    $PYTHON scripts/inference_test_bench.py \
        --config "$CONFIG" --ckpt "$ckpt" \
        --outdir "$OUT/$name" \
        --plms --ddim_steps 50 --scale 5 --n_samples 4 --seed 321 \
        --save_samples \
        ${MAX_BATCHES:+--max_batches "$MAX_BATCHES"} \
        ref_mode=track-ref \
        data.params.test.params.num_samples_per_class="$N_PER_CLASS" \
        $EXTRA_OVERRIDES
done
