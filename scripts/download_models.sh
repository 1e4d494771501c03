#!/usr/bin/env bash
# Fetch the published reference checkpoints (reference scripts/download_models.sh).
# mobi_tpu imports these torch checkpoints directly (mobi_tpu/import_torch.py):
#   model.ckpt                 - Paint-by-Example base (UNet+VAE+CLIP mapper)
#   mobi_nuscenes_epoch28.ckpt - MObI joint cam+lidar weights
#   range_autoencoder.ckpt     - range-view KL-VAE
set -e
mkdir -p checkpoints/mobi_nusc_512/autoencoders
echo "Download the artifacts listed in the MObI README into checkpoints/:"
echo "  checkpoints/model.ckpt"
echo "  checkpoints/mobi_nusc_512/mobi_nuscenes_epoch28.ckpt"
echo "  checkpoints/mobi_nusc_512/autoencoders/range_autoencoder.ckpt"
