#!/usr/bin/env bash
# Open-world bench (reference scripts/open-world_test_bench.sh): all-classes
# config incl. held-out classes + lidar FRD.
set -e
CKPT=${CKPT:?set CKPT}
OUT=${OUT:-results/open_world}
PYTHON=${PYTHON:-python}
N_PER_CLASS=${N_PER_CLASS:-100}
# EXTRA_OVERRIDES: extra config dotlist overrides (e.g. synthetic db paths);
# MAX_BATCHES: cap batches for smoke drives
$PYTHON scripts/inference_test_bench.py \
    --config configs/mobi_nusc_all-classes_512.yaml --ckpt "$CKPT" \
    --outdir "$OUT" \
    --plms --ddim_steps 50 --scale 5 --n_samples 4 --seed 321 \
    --save_samples --save_visualisations \
    ${MAX_BATCHES:+--max_batches "$MAX_BATCHES"} \
    data.params.test.params.num_samples_per_class="$N_PER_CLASS" \
    $EXTRA_OVERRIDES
$PYTHON eval_tool/lidar/frd_score.py \
    --path_orig "$OUT/lidar/range_orig" --path_pred "$OUT/lidar/range_pred" \
    > "$OUT/frd.txt" || true
cat "$OUT/frd.txt" 2>/dev/null || true
