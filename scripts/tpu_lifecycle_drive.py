"""Full reference lifecycle driven end-to-end on synthetic raw data:

  raw nuScenes tree -> create_data preprocessing (PBE database + infos)
  -> inference_test_bench inpainting on the TPU (edited sample files +
  objects.json) -> checkpoint-driven BEVFusion detection eval over the
  EDITED scenes with edited_objects_restrict.

This is the reference's complete product loop (README.md workflow:
create_data --pbe-database, detection_generate.sh, then
tools/test.py --eval-options edited_samples_path=... per
docs/edited-objects-eval.md:20-33) exercised as ONE chain, with each phase
in its own process (fresh jax platform state). Run with the tunnel idle:

  nohup /opt/venv/bin/python -u scripts/tpu_lifecycle_drive.py \
      > /tmp/lifecycle.log 2>&1 &
"""
from __future__ import annotations

import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
PY = sys.executable
T0 = time.time()


def log(msg):
    print(f"# {time.time() - T0:7.1f}s {msg}", flush=True)


def run(phase, cmd, **kw):
    log(f"[{phase}] {' '.join(cmd)}")
    t = time.time()
    r = subprocess.run(cmd, cwd=REPO, **kw)
    if r.returncode != 0:
        raise SystemExit(f"{phase} failed rc={r.returncode}")
    log(f"[{phase}] done in {time.time() - t:.1f}s")


def main():
    work = os.environ.get("MOBI_LIFECYCLE_DIR", "/tmp/lifecycle")
    raw = os.path.join(work, "raw")
    db = os.path.join(work, "db")
    itb_out = os.path.join(work, "itb")
    os.makedirs(work, exist_ok=True)

    ckpt = os.environ.get(
        "MOBI_LIFECYCLE_CKPT",
        "logs/tpu_evidence_b4_adapters/2026-08-17T18-00-10_mobi_nusc_512/"
        "checkpoints",
    )

    # ---- phase 1: synthetic raw tree (host-only)
    if not os.path.exists(os.path.join(raw, "v1.0-mini")):
        run("raw", [PY, "-c", (
            "from mobi_tpu.data.synthetic import build_synthetic_nuscenes_raw;"
            f"build_synthetic_nuscenes_raw({raw!r}, num_scenes=2, "
            "samples_per_scene=3)"
        )])

    # ---- phase 2: reference create_data equivalent (PBE db + infos)
    csv = os.path.join(db, "nuscenes_dbinfos_pbe_val.csv")
    if not os.path.exists(csv):
        run("preprocess", [
            PY, "-m", "mobi_tpu.data.preprocess", "--dataroot", raw,
            "--out-dir", db, "--split", "val", "--num-erase", "4",
            "--write-infos",
        ])
    pkl = os.path.join(db, "nuscenes_scene_infos_pbe_val.pkl")
    assert os.path.exists(csv) and os.path.exists(pkl)

    # ---- phase 3: TPU inpainting over the db; edited files + objects.json
    # (objects.json lives INSIDE the edited-samples dir — the patched
    # devkit's DetectionEval reads <edited_samples_path>/objects.json)
    objects_json = os.path.join(itb_out, "samples_seed321", "objects.json")
    if os.path.exists(objects_json):
        log("[inpaint] already done (objects.json exists), skipping")
    else:
        run("inpaint", [
            PY, "scripts/inference_test_bench.py",
            "--config", "configs/mobi_nusc_512.yaml", "--ckpt", ckpt,
            "--outdir", itb_out, "--ddim_steps", "50", "--scale", "5",
            "--n_samples", "4", "--n_workers", "1", "--seed", "321",
            "--save_samples", "--max_batches", "2",
            "ref_mode=track-ref",
            f"data.params.test.params.object_database_path={csv}",
            f"data.params.test.params.scene_database_path={pkl}",
            "data.params.test.params.num_samples_per_class=4",
            "data.params.test.params.min_lidar_points=1",
            "data.params.test.params.reference_image_min_h=1",
            "data.params.test.params.reference_image_min_w=1",
            "data.params.test.params.camera_visibility_min=0.0",
            f"data.params.test.params.object_meta_dump_path={objects_json}",
        ])
    edited = os.path.join(itb_out, "samples_seed321")
    n_edited = len(os.listdir(edited))
    log(f"edited sample files: {n_edited} in {edited}")
    assert os.path.exists(objects_json)

    # ---- phase 4: detector checkpoint (reuse the fabricated lidar-only
    # reference-format .pth from the detection drive, or refabricate)
    det_ckpt = "/tmp/det_eval_drive/det_fabricated.pth"
    if not os.path.exists(det_ckpt):
        run("fabricate-det", [
            PY, "scripts/tpu_detection_eval_drive.py", "--max-samples", "0",
        ])

    # ---- phase 5: detection eval over the EDITED scenes, restricted to
    # the edited objects (the reference's headline downstream table)
    results = os.path.join(work, "results_edited.json")
    run("detect-edited", [
        PY, "scripts/detection_eval.py", "--dataroot", raw,
        "--results", results, "--out-dir", os.path.join(work, "out"),
        "--checkpoint", det_ckpt, "--sweeps-num", "2",
        "--edited-samples-path", edited,
        "--edited-objects-restrict", "--verbose-inference",
    ])
    log("LIFECYCLE COMPLETE")


if __name__ == "__main__":
    main()
