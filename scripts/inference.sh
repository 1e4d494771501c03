#!/usr/bin/env bash
# Single-config inference run — reference scripts/inference.sh equivalent:
# the all-classes config, PLMS, CFG scale 5, id-ref, saving samples and
# visualisations.
set -e
cd "$(dirname "$0")/.."

CONFIG=${CONFIG:-configs/mobi_nusc_all-classes_512.yaml}
CKPT=${CKPT:-checkpoints/mobi_nuscenes_epoch28.ckpt}
OUTDIR=${OUTDIR:-results/inference}

python3 scripts/inference_test_bench.py \
    --plms \
    --outdir "$OUTDIR" \
    --config "$CONFIG" \
    --ckpt "$CKPT" \
    --scale 5 \
    --ddim_steps 50 \
    --n_samples 8 \
    --n_workers 4 \
    --save_samples \
    --save_visualisations \
    ref_mode="id-ref" \
    data.params.test.params.num_samples_per_class=100 \
    data.params.test.params.include_erase_boxes=False \
    use_camera=True \
    use_lidar=True
