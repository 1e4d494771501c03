#!/usr/bin/env bash
# Realism bench (reference scripts/realism_test_bench.sh): inference over
# 100 objects/class x 4 reference modes, then FID / LPIPS / CLIP on camera
# patches and D-LPIPS / I-LPIPS on the saved normalized range-view PNGs,
# accumulated into realism_table.csv.
set -e
CKPT=${CKPT:-checkpoints/mobi_nusc_512/mobi_nuscenes_epoch28.ckpt}
CONFIG=${CONFIG:-configs/mobi_nusc_512.yaml}
OUT=${OUT:-results/realism}
STEPS=${STEPS:-50}
SCALE=${SCALE:-5}
USE_LIDAR=${USE_LIDAR:-True}
N_PER_CLASS=${N_PER_CLASS:-100}
PYTHON=${PYTHON:-python}
# EXTRA_OVERRIDES: extra config dotlist overrides (e.g. synthetic db paths);
# MAX_BATCHES: cap batches per mode for smoke drives

RESULTS_TABLE="$OUT/realism_table.csv"
mkdir -p "$OUT"
if [ ! -f "$RESULTS_TABLE" ]; then
    echo "Model,Reference Type,FID,LPIPS,CLIP,D-LPIPS,I-LPIPS" > "$RESULTS_TABLE"
fi

run_experiment () {
    local ref_mode=$1
    $PYTHON scripts/inference_test_bench.py \
        --config "$CONFIG" --ckpt "$CKPT" \
        --outdir "$OUT/$ref_mode" \
        --plms --ddim_steps "$STEPS" --scale "$SCALE" \
        --n_samples 4 --seed 321 --save_samples --save_visualisations \
        ${MAX_BATCHES:+--max_batches "$MAX_BATCHES"} \
        ref_mode="$ref_mode" \
        data.params.test.params.num_samples_per_class="$N_PER_CLASS" \
        use_lidar="$USE_LIDAR" \
        $EXTRA_OVERRIDES
}

score () {  # score <tool> <label> <target> <pred>
    $PYTHON "eval_tool/camera/$1" --path_target "$3" --path_pred "$4" \
        | grep -oP "$2:\\s*\\K[0-9.]+" || echo "nan"
}

compute_scores () {
    local ref_mode=$1
    local dir="$OUT/$ref_mode"
    local model_name
    model_name=$(basename "$CKPT" .ckpt)

    FID=$(score fid_score.py FID "$dir/camera/patch_gt" "$dir/camera/patch_pred")
    LPIPS=$(score lpips_score.py LPIPS "$dir/camera/patch_gt" "$dir/camera/patch_pred")
    CLIP=$($PYTHON eval_tool/camera/clip_score.py \
        --path_ref "$dir/camera/object_ref" --path_pred "$dir/camera/object_pred" \
        | grep -oP 'CLIP score:\s*\K[0-9.]+' || echo "nan")

    if [[ "$USE_LIDAR" == "True" ]]; then
        D_LPIPS=$(score lpips_score.py LPIPS \
            "$dir/lidar/range_depth_target" "$dir/lidar/range_depth_pred")
        I_LPIPS=$(score lpips_score.py LPIPS \
            "$dir/lidar/range_intensity_target" "$dir/lidar/range_intensity_pred")
    else
        D_LPIPS=""; I_LPIPS=""
    fi
    echo "${model_name},${ref_mode},${FID},${LPIPS},${CLIP},${D_LPIPS},${I_LPIPS}" \
        >> "$RESULTS_TABLE"
}

for mode in in-domain-ref id-ref track-ref cross-domain-ref; do
    run_experiment "$mode"
    compute_scores "$mode"
done
cat "$RESULTS_TABLE"
