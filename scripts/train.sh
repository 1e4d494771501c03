#!/usr/bin/env bash
# Joint camera+lidar MObI training (reference scripts/train.sh).
# The reference trains 2-GPU DDP; here one SPMD program spans all TPU chips.
set -e
python train.py \
    --base configs/mobi_nusc_512.yaml \
    --pretrained_model checkpoints/model.ckpt \
    --logdir models/mobi_tpu \
    --save_top_k 5 \
    "$@"
