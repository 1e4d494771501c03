#!/usr/bin/env bash
# Range autoencoder adapter finetuning (reference scripts/finetune_autonecoder.sh).
set -e
python scripts/train_autoencoder.py \
    --base configs/range_autoencoder.yaml \
    --pretrained_model checkpoints/model.ckpt \
    "$@"
