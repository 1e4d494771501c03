#!/usr/bin/env bash
# A/B the encoder-propagation fast mode THROUGH the realism harness:
# the same checkpoint, seed, and objects sampled twice — exact DDIM vs
# --encoder-interval 2 — then the full camera/lidar metric stack
# (FID / LPIPS / CLIP / D-LPIPS / I-LPIPS, realism_test_bench.sh
# compute_scores) on both runs, with the deltas in one table.
#
# Complements scripts/encoder_prop_accuracy.py (latent PSNR vs interval):
# that sweep measures numerical sensitivity; this measures whether the
# harness METRICS move. PROFILE.md "Encoder-propagation" records the run.
#
#   N_PER_CLASS=2 MAX_BATCHES=1 EXTRA_OVERRIDES="<synthetic db dotlist>" \
#     WEIGHTS_DIR=logs/eval_weights bash scripts/encoder_prop_ab.sh
set -e
CKPT=${CKPT:-}                       # empty: random-init smoke weights
CONFIG=${CONFIG:-configs/mobi_nusc_512.yaml}
OUT=${OUT:-results/encoder_prop_ab}
STEPS=${STEPS:-50}
SCALE=${SCALE:-5}
N_PER_CLASS=${N_PER_CLASS:-2}
SEGMENTS=${SEGMENTS:-5}
INTERVAL=${INTERVAL:-2}
PYTHON=${PYTHON:-python}
WEIGHTS_DIR=${WEIGHTS_DIR:-logs/eval_weights}

mkdir -p "$OUT"
TABLE="$OUT/encoder_prop_ab.csv"
echo "Variant,FID,LPIPS,CLIP,D-LPIPS,I-LPIPS" > "$TABLE"

if [ ! -f "$WEIGHTS_DIR/clip_vit_b32.pth" ]; then
    $PYTHON scripts/fabricate_eval_weights.py --out "$WEIGHTS_DIR"
fi
export CLIP_B32_WEIGHTS="$WEIGHTS_DIR/clip_vit_b32.pth"
export LPIPS_WEIGHTS="$WEIGHTS_DIR/lpips_alex.pth"
export ALEXNET_WEIGHTS="$WEIGHTS_DIR/alexnet.pth"

run_variant () {  # run_variant <name> <extra itb flags...>
    local name=$1; shift
    $PYTHON scripts/inference_test_bench.py \
        --config "$CONFIG" ${CKPT:+--ckpt "$CKPT"} \
        --outdir "$OUT/$name" \
        --ddim_steps "$STEPS" --scale "$SCALE" \
        --n_samples 4 --seed 321 --save_samples --save_visualisations \
        ${MAX_BATCHES:+--max_batches "$MAX_BATCHES"} \
        "$@" \
        ref_mode=track-ref \
        data.params.test.params.num_samples_per_class="$N_PER_CLASS" \
        $EXTRA_OVERRIDES
}

score () {  # score <tool> <label> <target> <pred>
    $PYTHON "eval_tool/camera/$1" --path_target "$3" --path_pred "$4" \
        | grep -oP "$2:\\s*\\K[0-9.]+" || echo "nan"
}

score_variant () {
    local name=$1
    local dir="$OUT/$name"
    FID=$(score fid_score.py FID "$dir/camera/patch_gt" "$dir/camera/patch_pred")
    LPIPS=$(score lpips_score.py LPIPS "$dir/camera/patch_gt" "$dir/camera/patch_pred")
    CLIP=$($PYTHON eval_tool/camera/clip_score.py \
        --path_ref "$dir/camera/object_ref" --path_pred "$dir/camera/object_pred" \
        | grep -oP 'CLIP score:\s*\K[0-9.]+' || echo "nan")
    D_LPIPS=$(score lpips_score.py LPIPS \
        "$dir/lidar/range_depth_target" "$dir/lidar/range_depth_pred")
    I_LPIPS=$(score lpips_score.py LPIPS \
        "$dir/lidar/range_intensity_target" "$dir/lidar/range_intensity_pred")
    echo "${name},${FID},${LPIPS},${CLIP},${D_LPIPS},${I_LPIPS}" >> "$TABLE"
}

run_variant exact --sample-segments "$SEGMENTS"
score_variant exact
run_variant "interval$INTERVAL" --encoder-interval "$INTERVAL"
score_variant "interval$INTERVAL"
cat "$TABLE"
