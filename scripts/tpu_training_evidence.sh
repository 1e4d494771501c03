#!/bin/bash
# TPU training evidence run (PROFILE.md / VERDICT item 5): real train.py on
# the v5e over a synthetic nuScenes-schema database at the production 512
# config. Records step time, loss descent, epoch wall time + peak device
# memory (metrics.jsonl), and an ImageLogger collage.
#
#   bash scripts/tpu_training_evidence.sh [extra dotted overrides...]
#
# Variants used for PROFILE.md:
#   batch_size=4 (pairs)  remat off:  (default below)
#   remat on:   model.params.unet_config.params.use_checkpoint=True
#   mini-256:   --base configs/mobi_nusc-mini_256.yaml
#
# Run ONE at a time (single tunnel client rule, see verify skill).
set -e
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python

DB=/root/synthdb_512
if [ ! -f "$DB/synthetic_dbinfos.csv" ]; then
  echo "# building synthetic database (native 1600x900 cameras) ..."
  $PY - <<'EOF'
from mobi_tpu.data.synthetic import build_synthetic_database
paths = build_synthetic_database(
    "/root/synthdb_512", num_scenes=6, objects_per_scene=6,
    img_w=1600, img_h=900, seed=0)
print(paths)
EOF
fi

exec $PY -u train.py --base configs/mobi_nusc_512.yaml \
  --max_steps "${MAX_STEPS:-200}" --log_every 10 \
  --save_every 1000000 --val_every 1000000 \
  --image_log_every "${IMAGE_LOG_EVERY:-150}" --image_log_steps 20 \
  --num_workers 1 --logdir "${LOGDIR:-logs/tpu_evidence}" \
  batch_size="${BATCH_PAIRS:-4}" \
  num_workers_per_gpu=4 \
  data.params.train.params.object_database_path="$DB/synthetic_dbinfos.csv" \
  data.params.train.params.scene_database_path="$DB/synthetic_scene_infos.pkl" \
  data.params.train.params.num_samples_per_class=64 \
  data.params.train.params.min_lidar_points=1 \
  data.params.train.params.reference_image_min_h=1 \
  data.params.train.params.reference_image_min_w=1 \
  data.params.validation.params.object_database_path="$DB/synthetic_dbinfos.csv" \
  data.params.validation.params.scene_database_path="$DB/synthetic_scene_infos.pkl" \
  data.params.validation.params.num_samples_per_class=8 \
  data.params.validation.params.min_lidar_points=1 \
  data.params.validation.params.reference_image_min_h=1 \
  data.params.validation.params.reference_image_min_w=1 \
  "$@"
