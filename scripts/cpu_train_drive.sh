#!/bin/bash
# CPU smoke drive of the full train.py surface: tiny 64x64 joint model over a
# synthetic nuScenes-schema database, exercising the data pipeline, the
# scheduler_config wiring, the metrics-logger stack (jsonl + csv via the
# lightning.logger override), ImageLogger sampling, checkpoint save, and the
# final-save path — in a few minutes on a 1-core host, no TPU needed.
#
#   bash scripts/cpu_train_drive.sh [extra dotted overrides...]
set -e
cd "$(dirname "$0")/.."
PY=/opt/venv/bin/python

DB=${MOBI_CPU_DRIVE_DB:-/tmp/synthdb_cpu64}
if [ ! -f "$DB/synthetic_dbinfos.csv" ]; then
  echo "# building small synthetic database ..."
  $PY - "$DB" <<'EOF'
import sys
from mobi_tpu.data.synthetic import build_synthetic_database
paths = build_synthetic_database(
    sys.argv[1], num_scenes=3, objects_per_scene=4,
    img_w=320, img_h=180, seed=0)
print(paths)
EOF
fi

exec $PY -u train.py --base configs/mobi_nusc-mini_256.yaml \
  --platform cpu \
  --max_steps "${MAX_STEPS:-8}" --log_every 2 \
  --save_every 6 --val_every 1000000 \
  --image_log_every 4 --image_log_steps 2 --image_log_max 1 \
  --num_workers 1 --logdir "${LOGDIR:-logs/cpu_drive}" \
  batch_size=2 \
  precision=fp32 \
  image_height=64 image_width=64 latent_size=8 \
  range_height=64 range_width=64 \
  lightning.logger=testtube \
  model.params.image_size=8 \
  model.params.unet_config.params.image_size=8 \
  model.params.unet_config.params.model_channels=32 \
  model.params.unet_config.params.channel_mult="[1, 2]" \
  model.params.unet_config.params.attention_resolutions="[1]" \
  model.params.unet_config.params.num_heads=4 \
  model.params.first_stage_config.params.ddconfig.ch=32 \
  model.params.first_stage_config.params.ddconfig.ch_mult="[1, 1, 2, 2]" \
  model.params.first_stage_config.params.ddconfig.num_res_blocks=1 \
  model.params.lidar_stage_config.params.ddconfig.ch=32 \
  model.params.lidar_stage_config.params.ddconfig.ch_mult="[1, 1, 2, 2]" \
  model.params.lidar_stage_config.params.ddconfig.num_res_blocks=1 \
  data.params.train.params.object_database_path="$DB/synthetic_dbinfos.csv" \
  data.params.train.params.scene_database_path="$DB/synthetic_scene_infos.pkl" \
  data.params.train.params.num_samples_per_class=8 \
  data.params.train.params.min_lidar_points=1 \
  data.params.train.params.reference_image_min_h=1 \
  data.params.train.params.reference_image_min_w=1 \
  data.params.validation.params.object_database_path="$DB/synthetic_dbinfos.csv" \
  data.params.validation.params.scene_database_path="$DB/synthetic_scene_infos.pkl" \
  data.params.validation.params.num_samples_per_class=4 \
  data.params.validation.params.min_lidar_points=1 \
  data.params.validation.params.reference_image_min_h=1 \
  data.params.validation.params.reference_image_min_w=1 \
  "$@"
