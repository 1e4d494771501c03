#!/usr/bin/env bash
# Realism bench (reference scripts/realism_test_bench.sh): inference over
# 100 objects/class x 4 reference modes, then FID / LPIPS / CLIP score on
# camera patches and D-LPIPS / I-LPIPS on range images.
set -e
CKPT=${CKPT:-checkpoints/mobi_nusc_512/mobi_nuscenes_epoch28.ckpt}
CONFIG=${CONFIG:-configs/mobi_nusc_512.yaml}
OUT=${OUT:-results/realism}
STEPS=${STEPS:-50}
SCALE=${SCALE:-5}

run_experiment () {
    local ref_mode=$1
    python scripts/inference_test_bench.py \
        --config "$CONFIG" --ckpt "$CKPT" \
        --outdir "$OUT/$ref_mode" \
        --plms --ddim_steps "$STEPS" --scale "$SCALE" \
        --n_samples 4 --seed 321 --save_samples --save_visualisations \
        ref_mode="$ref_mode" \
        data.params.test.params.num_samples_per_class=100
}

compute_scores () {
    local ref_mode=$1
    local dir="$OUT/$ref_mode"
    python eval_tool/camera/fid_score.py \
        --path_target "$dir/camera/patch_gt" --path_pred "$dir/camera/patch_pred" \
        > "$dir/fid.txt" || true
    python eval_tool/camera/lpips_score.py \
        --path_target "$dir/camera/patch_gt" --path_pred "$dir/camera/patch_pred" \
        > "$dir/lpips.txt" || true
    python eval_tool/camera/clip_score.py \
        --path_ref "$dir/camera/object_ref" --path_pred "$dir/camera/object_pred" \
        > "$dir/clip.txt" || true
}

for mode in id-ref track-ref in-domain-ref cross-domain-ref; do
    run_experiment "$mode"
    compute_scores "$mode"
done
