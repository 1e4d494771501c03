"""Batched inference test bench — CLI parity with
/root/reference/scripts/inference_test_bench.py:198-676.

  python scripts/inference_test_bench.py --config configs/mobi_nusc_512.yaml \
      --ckpt <ckpt> --outdir results/run --plms --ddim_steps 50 --scale 5 \
      --n_samples 4 --seed 321 --save_samples --save_visualisations \
      [data.params.test.params.num_samples_per_class=100 ...]

Per batch: encode conditioning + VAE stages, run the jitted CFG sampling scan,
decode both modalities, then composite on host:
  * camera: resize the predicted 512-crop back to the original crop window and
    Gaussian-blend it into the full frame with the blurred edit mask
    (reference :478-527); optional --copy-paste baseline;
  * lidar: build the predicted-object instance mask by re-projecting the
    predicted range crop to 3D and testing against the target box, paste
    depth/intensity into the original range view, save range_pred/range_orig
    npys and the edited point cloud (reference :567-652).
    Intensity units: the DEFAULT is reference-faithful — the predicted
    intensity crop is pasted in normalized [-1, 1] units into the raw
    0..255-unit canvas (reference inference_test_bench.py:607-611 pastes
    ddpm.py:1541's normalized sample_int into nuscenes.py:421's raw
    range_int_orig), because the published I-LPIPS/FRD numbers were produced
    that way. Pass --fixed-intensity-paste to instead convert the crop back
    to 0..255 before pasting (unit-consistent, but not comparable to the
    published table).
  * per-batch lidar MSE / median-error aggregation -> metrics.csv (:654-669).
"""
from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def parse_args(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", type=str, default="outputs/test_bench")
    p.add_argument("--config", type=str, required=True)
    p.add_argument("--ckpt", type=str, default="")
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--ddim_eta", type=float, default=0.0)
    p.add_argument("--n_samples", type=int, default=4, help="batch size")
    p.add_argument("--n_workers", type=int, default=4)
    p.add_argument("--scale", type=float, default=1.0)
    p.add_argument("--seed", type=int, default=42)
    p.add_argument("--fixed_code", action="store_true")
    p.add_argument("--rotation_test", action="store_true")
    p.add_argument("--save_samples", action="store_true")
    p.add_argument("--save_visualisations", action="store_true")
    p.add_argument("--copy-paste", dest="copy_paste", action="store_true")
    p.add_argument(
        "--fixed-intensity-paste", dest="fixed_intensity_paste",
        action="store_true",
        help="convert predicted intensity to raw 0..255 units before "
             "paste-back (default: reference-faithful normalized-unit paste)",
    )
    p.add_argument("--max_batches", type=int, default=None)
    p.add_argument(
        "--sample-segments", dest="sample_segments", type=int,
        default=int(os.environ.get("MOBI_ITB_SEGMENTS", "1")),
        help="dispatch the DDIM loop as N short device programs sharing one "
        "executable (pipeline.SegmentedInpaint) — use when one execute "
        "would exceed a runtime per-program limit (PROFILE.md 'device "
        "fault ... execute-time limit'); exact ddim, single device only",
    )
    p.add_argument(
        "--encoder-interval", dest="encoder_interval", type=int, default=1,
        help="encoder propagation: run the UNet encoder+middle every Nth "
        "DDIM step, reusing cached skips otherwise ('Faster Diffusion', "
        "arXiv 2312.09608). APPROXIMATE — off (1) keeps exact reference "
        "DDIM semantics; accuracy sweep in scripts/encoder_prop_accuracy.py "
        "and the realism-harness A/B in PROFILE.md",
    )
    p.add_argument("--mesh-dp", dest="mesh_dp", type=int, default=1,
                   help="data-parallel inference over the first N devices "
                        "(params replicated, whole (cam,lidar) pairs per "
                        "device; n_samples must divide N). The reference "
                        "samples on one GPU; this is the pod-scale path.")
    p.add_argument("overrides", nargs=argparse.REMAINDER)
    return p.parse_args(argv)


def main(argv=None):
    opt = parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp

    from mobi_tpu.checkpoint import load_torch_checkpoint, restore_partial
    from mobi_tpu.data import range_projection as rp
    from mobi_tpu.data.geometry import points_in_bbox_corners
    from mobi_tpu.data.loader import PrefetchLoader
    from mobi_tpu.data.nuscenes import collate
    from mobi_tpu.eval.lidar_metrics import lidar_sample_metrics
    from mobi_tpu.models.diffusion import MobiDiffusion
    from mobi_tpu.ops.ranges import inverse_intensity_normalization
    from mobi_tpu.utils.config import (
        instantiate_from_config,
        load_config,
        mobi_config_from_yaml,
    )

    cfg = load_config([opt.config], [s for s in opt.overrides if "=" in s])
    mcfg = mobi_config_from_yaml(cfg)
    model = MobiDiffusion(mcfg)
    use_ema = bool(cfg["model"]["params"].get("use_ema", False))
    rng = jax.random.PRNGKey(opt.seed)
    if opt.ckpt and os.path.isdir(opt.ckpt):
        # orbax dir: the restored tree is complete, so skip the expensive
        # host-side init_params (it would be discarded wholesale).
        # Accepts either a manager dir (restores the latest step) or a
        # single step dir inside one (model_selection.sh iterates those).
        print(f"loading checkpoint {opt.ckpt}")
        from mobi_tpu.checkpoint import CheckpointManager

        ckpt_dir, step = opt.ckpt, None
        base = os.path.basename(os.path.normpath(ckpt_dir))
        if base.isdigit():
            ckpt_dir, step = os.path.dirname(os.path.normpath(ckpt_dir)), int(base)
        mgr = CheckpointManager(ckpt_dir)
        restored = mgr.restore(step=step)
        params = restored["params"]
        # sample under ema_scope like the reference bench
        # (/root/reference/scripts/inference_test_bench.py:405): with
        # use_ema the orbax state carries the EMA shadow of the UNet.
        if use_ema and restored.get("ema") is not None:
            params = {**params, "unet": restored["ema"]["ema_params"]}
            print("using EMA weights for sampling (ema_scope)")
    else:
        # no checkpoint: random-init params (smoke/drive runs). Flagship
        # init executes the full forward eagerly on the host CPU (~20 min
        # on 1 core) — reuse the validated disk cache bench.py/train.py use.
        from mobi_tpu.utils.param_cache import cached_init

        params = cached_init(
            lambda r: model.init_params(r), rng, repr(mcfg),
            shape_fn=lambda r: model.init_params(r, on_cpu=False),
        )
    if opt.ckpt and not os.path.isdir(opt.ckpt):
        print(f"loading checkpoint {opt.ckpt}")
        from mobi_tpu.import_torch import (
            extract_ema_state_dict,
            import_mobi_checkpoint,
        )

        sd = load_torch_checkpoint(opt.ckpt)
        if use_ema:
            # reference ema_scope at sampling: overlay the LitEma shadows
            # (model_ema.* buffers) onto the live model.* entries before
            # the key-mapped import (ldm/modules/ema.py:52-60).
            ema_sd, _ = extract_ema_state_dict(sd)
            if ema_sd is not None:
                sd = {**sd, **ema_sd}
                print("using EMA weights for sampling (ema_scope)")
        imported = import_mobi_checkpoint(
            sd,
            channel_mult=tuple(mcfg.unet_channel_mult),
            num_res_blocks=mcfg.unet_num_res_blocks,
            attention_resolutions=tuple(mcfg.unet_attention_resolutions),
            vae_resolution=mcfg.image_height,
        )
        params = restore_partial(params, imported)

    # Pin params to the accelerator ONCE. bf16 residency for >=2-D weights
    # only when the model itself computes in bf16 (PROFILE.md "bf16
    # parameter residency"); a float32 config keeps fp32 weights so parity
    # runs are exact. MOBI_ITB_BF16_PARAMS=0 opts out regardless. Without
    # the device pin every batch re-transfers the host tree through the
    # tunnel, which dominates wall time on tunneled runtimes.
    if (mcfg.dtype == jnp.bfloat16
            and os.environ.get("MOBI_ITB_BF16_PARAMS", "1") == "1"):
        params = jax.tree.map(
            lambda x: jnp.asarray(x).astype(jnp.bfloat16)
            if (hasattr(x, "dtype") and x.dtype == jnp.float32
                and getattr(x, "ndim", 0) >= 2)
            else jnp.asarray(x),
            params,
        )
    mesh = None
    if opt.mesh_dp > 1:
        from mobi_tpu.pipeline import inference_mesh, replicate_params

        if opt.n_samples % opt.mesh_dp:
            raise SystemExit(
                f"--n_samples {opt.n_samples} must divide --mesh-dp "
                f"{opt.mesh_dp} (whole pairs per device)"
            )
        mesh = inference_mesh(dp=opt.mesh_dp)
        params = replicate_params(mesh, params)
        print(f"dp-sharded inference over {opt.mesh_dp} devices")
    else:
        params = jax.device_put(params, jax.devices()[0])
    jax.block_until_ready(params)

    split = "rotation_test" if opt.rotation_test else "test"
    ds_cfg = dict(cfg["data"]["params"][split])
    ds_cfg.setdefault("params", {})["return_original_image"] = True
    dataset = instantiate_from_config(ds_cfg)
    loader = PrefetchLoader(
        dataset, opt.n_samples, shuffle=False, num_threads=opt.n_workers,
        drop_last=False,
    )

    outpath = opt.outdir
    camera_path = os.path.join(outpath, "camera")
    lidar_path = os.path.join(outpath, "lidar")
    sample_path = os.path.join(outpath, f"samples_seed{opt.seed}")
    for d in (camera_path, lidar_path, sample_path):
        os.makedirs(d, exist_ok=True)

    sampler = "plms" if opt.plms else "ddim"

    from mobi_tpu.pipeline import make_inpaint_pipeline

    run_batch = make_inpaint_pipeline(
        model, num_steps=opt.ddim_steps, guidance_scale=opt.scale,
        sampler=sampler, eta=opt.ddim_eta, mesh=mesh,
        sample_segments=opt.sample_segments,
        encoder_interval=opt.encoder_interval,
    )

    def strip(batch):
        return {
            "image": {
                "GT": jnp.asarray(batch["image"]["GT"]),
                "inpaint_image": jnp.asarray(batch["image"]["inpaint_image"]),
                "inpaint_mask": jnp.asarray(batch["image"]["inpaint_mask"]),
                "cond": {
                    "ref_image": jnp.asarray(batch["image"]["cond"]["ref_image"]),
                    "ref_bbox": jnp.asarray(batch["image"]["cond"]["ref_bbox"]),
                },
            },
            "lidar": {
                "range_data": jnp.asarray(batch["lidar"]["range_data"]),
                "range_data_inpaint": jnp.asarray(
                    batch["lidar"]["range_data_inpaint"]
                ),
                "range_mask": jnp.asarray(batch["lidar"]["range_mask"]),
                "cond": {"ref_bbox": jnp.asarray(batch["lidar"]["cond"]["ref_bbox"])},
            },
        }

    metrics_acc: dict = {}
    state = {"n_done": 0}
    t0 = time.time()

    def finish_batch(bi, batch, out):
        """Host side of one batch: fetch device outputs, lidar metrics,
        compositing, saves. Runs on the pipeline worker thread so batch
        N-1's 1-3s of host work overlaps batch N's device scan
        (VERDICT r2 item 3; the reference loop is fully serial,
        /root/reference/scripts/inference_test_bench.py:467-652)."""
        cam = np.asarray(out.get("camera")) if "camera" in out else None
        lid = np.asarray(out.get("lidar")) if "lidar" in out else None
        B = len(batch["id_name"])

        if lid is not None:
            m = lidar_sample_metrics(
                pred=lid,
                gt=batch["lidar"]["range_data"],
                instance_mask=batch["lidar"]["range_instance_mask"],
                edit_mask=batch["lidar"]["range_mask"],
                width_crop=batch["lidar"]["width_crop"],
                min_depth_obj=batch["lidar"]["min_depth_obj"],
                max_depth_obj=batch["lidar"]["max_depth_obj"],
                range_object_norm=mcfg.range_object_norm,
                range_object_norm_scale=mcfg.range_object_norm_scale,
                range_int_norm=mcfg.range_int_norm,
            )
            for k, v in m.items():
                metrics_acc.setdefault(k, []).append(v)

        for i in range(B):
            seg = batch["id_name"][i]
            image_recon = None
            if cam is not None and opt.save_samples:
                image_recon = composite_camera(
                    cam[i], batch, i, camera_path, sample_path, seg, opt, cv2
                )
            if lid is not None and opt.save_samples:
                composite_lidar(
                    lid[i], batch, i, lidar_path, sample_path, seg, opt,
                    mcfg, image_recon,
                )
            if cam is not None and opt.save_visualisations:
                save_camera_grid(cam[i], batch, i, camera_path, seg, opt, cv2)
            if lid is not None and opt.save_visualisations:
                save_lidar_visuals(lid[i], batch, i, lidar_path, seg, opt, cv2)
        state["n_done"] += B
        print(f"batch {bi}: {state['n_done']} objects, "
              f"{state['n_done'] / (time.time() - t0):.3f} obj/s")

    # double-buffered host/device pipeline: the main thread dispatches batch
    # N to the device (jax dispatch is async) while one worker thread
    # fetches + composites batch N-1. Depth 1 bounds host memory to two
    # in-flight batches. MOBI_ITB_PIPELINE=0 restores the serial loop (the
    # A/B knob used for the PROFILE measurement).
    from concurrent.futures import ThreadPoolExecutor

    pipelined = os.environ.get("MOBI_ITB_PIPELINE", "1") == "1"
    pool = ThreadPoolExecutor(max_workers=1) if pipelined else None
    pending = None
    for bi, batch in enumerate(loader):
        if opt.max_batches is not None and bi >= opt.max_batches:
            break
        key = jax.random.PRNGKey(opt.seed if opt.fixed_code else opt.seed + bi)
        batch_dev = strip(batch)
        if mesh is not None:
            from mobi_tpu.parallel.mesh import shard_batch

            batch_dev = shard_batch(mesh, batch_dev)
        if (bi == 0 and opt.sample_segments > 1
                and os.environ.get("MOBI_ITB_TIMED_SEGMENTS", "0") == "1"
                and hasattr(run_batch, "timed_call")):
            # per-program walls for the PROFILE record: one warm pass to
            # compile the tiny sync-fetch programs, then one timed pass
            # (serialized; later batches go back to async dispatch)
            run_batch.timed_call(params, batch_dev, key)
            out, walls = run_batch.timed_call(params, batch_dev, key)
            print("segment walls (s): "
                  + ", ".join(f"{n}={w:.2f}" for n, w in walls))
        else:
            out = run_batch(params, batch_dev, key)
        if pool is None:
            finish_batch(bi, batch, out)
        else:
            if pending is not None:
                pending.result()  # keep at most 2 batches in flight
            pending = pool.submit(finish_batch, bi, batch, out)
    if pending is not None:
        pending.result()
    if pool is not None:
        pool.shutdown(wait=True)

    import pandas as pd

    df = {"mse": {}, "median_error": {}}
    for k, vals in metrics_acc.items():
        mean = float(np.mean(vals))
        group, name = k.split("/")
        df[group][name] = mean
    pd.DataFrame(df).to_csv(os.path.join(outpath, "metrics.csv"))
    print(f"Samples written to {outpath}")


def composite_camera(pred, batch, i, camera_path, sample_path, seg, opt, cv2):
    """Blend the predicted 512-crop back into the full frame
    (reference :478-527)."""
    orig = batch["image"]["orig"]
    image = np.asarray(orig["image"][i])          # [-1,1] HWC full frame
    mask = np.asarray(orig["mask"][i])            # full-res edit mask
    left, top, crop_W, crop_H = [int(v) for v in orig["crop"][i]]
    file_name = orig["file_name"][i]

    patch_pred = cv2.resize(
        ((pred + 1) / 2 * 255).astype(np.uint8), (crop_W, crop_H),
        interpolation=cv2.INTER_LINEAR,
    )
    patch_gt = cv2.resize(
        ((np.asarray(batch["image"]["GT"][i]) + 1) / 2 * 255).astype(np.uint8),
        (crop_W, crop_H), interpolation=cv2.INTER_LINEAR,
    )
    ys, xs = np.nonzero(1 - mask)
    y1, y2 = ys.min(), ys.max()
    x1, x2 = xs.min(), xs.max()

    image_u8 = ((image + 1) / 2 * 255).astype(np.uint8)
    image_pred = np.zeros_like(image_u8)
    image_pred[top : top + crop_H, left : left + crop_W] = patch_pred

    ref = np.asarray(batch["image"]["cond"]["ref_image"][i])
    from mobi_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    ref_u8 = np.clip(
        (ref * np.asarray(CLIP_IMAGE_STD) + np.asarray(CLIP_IMAGE_MEAN)) * 255,
        0, 255,
    ).astype(np.uint8)

    if opt.copy_paste:
        image_pred[y1:y2, x1:x2] = cv2.resize(ref_u8, (x2 - x1, y2 - y1))
        mask_conv = cv2.dilate(mask, np.ones((5, 5), np.uint8), iterations=1)
    else:
        mask_conv = cv2.GaussianBlur(mask, (15, 15), 7.0)

    image_recon = (
        mask_conv[..., None] * image_u8 + (1 - mask_conv[..., None]) * image_pred
    ).astype(np.uint8)
    composited_patch = image_recon[top : top + crop_H, left : left + crop_W]
    object_pred = cv2.resize(image_pred[y1:y2, x1:x2], (224, 224))

    cv2.imwrite(os.path.join(sample_path, file_name), image_recon[..., ::-1])
    for sub, img in (
        ("object_pred", object_pred),
        ("object_ref", ref_u8),
        ("patch_gt", patch_gt),
        ("patch_pred", composited_patch),
    ):
        os.makedirs(os.path.join(camera_path, sub), exist_ok=True)
        cv2.imwrite(
            os.path.join(camera_path, sub, f"{seg}_{sub}_seed{opt.seed}.png"),
            img[..., ::-1],
        )
    return image_recon


def composite_lidar(pred, batch, i, lidar_path, sample_path, seg, opt, mcfg,
                    image_recon=None):
    """Paste the predicted object back into the native range view and save
    eval artifacts (reference :567-652)."""
    from mobi_tpu.data import range_projection as rp
    from mobi_tpu.data.geometry import points_in_bbox_corners
    from mobi_tpu.ops.ranges import (
        inverse_depth_normalization,
        inverse_intensity_normalization,
    )

    lid = batch["lidar"]
    depth_crop = np.asarray(pred[..., 0], np.float64)
    int_crop = np.asarray(pred[..., 1], np.float64)
    if mcfg.range_object_norm:
        depth_crop = inverse_depth_normalization(
            depth_crop, float(lid["min_depth_obj"][i]), float(lid["max_depth_obj"][i]),
            alpha=mcfg.range_object_norm_scale,
        )
    if mcfg.range_int_norm:
        int_crop = inverse_intensity_normalization(int_crop)
    if opt.fixed_intensity_paste:
        # opt-in unit fix: raw 0..255 intensity units of the original canvas
        int_crop = (int_crop + 1) / 2 * 255.0

    geom = rp.RangeCropGeom(
        crop_left=int(lid["range_shift_left"][i]),
        width_crop=int(lid["width_crop"][i]),
    )
    depth_orig = np.asarray(lid["range_depth_orig"][i], np.float64)
    int_orig = np.asarray(lid["range_int_orig"][i], np.float64)
    pitch = np.asarray(lid["range_pitch"][i])
    yaw = np.asarray(lid["range_yaw"][i])

    depth_pasted, int_pasted = rp.undo_range_transforms(
        geom, depth_crop, depth_orig, int_crop, int_orig
    )

    # predicted-object instance mask via reprojection
    gt_inst = np.asarray(lid["range_instance_mask_orig"][i])
    label = np.arange(gt_inst.size).reshape(gt_inst.shape)
    pts, pts_label, _ = rp.range_to_pcd(depth_pasted, pitch, yaw, label)
    bbox = np.asarray(batch["bbox_3d"][i])[None]
    obj = points_in_bbox_corners(pts, bbox)
    pred_inst = np.zeros(gt_inst.size)
    pred_inst[pts_label[obj[:, 0]].astype(np.int64)] = 1
    pred_inst = pred_inst.reshape(gt_inst.shape)
    inst = np.logical_or(pred_inst, gt_inst > 0)

    depth_final = np.where(inst, depth_pasted, depth_orig)
    int_final = np.where(inst, int_pasted, int_orig)

    os.makedirs(os.path.join(lidar_path, "range_pred"), exist_ok=True)
    os.makedirs(os.path.join(lidar_path, "range_orig"), exist_ok=True)
    np.save(
        os.path.join(lidar_path, "range_pred", f"{seg}_range_pred_seed{opt.seed}.npy"),
        np.stack([depth_final, int_final, pitch, yaw]),
    )
    np.save(
        os.path.join(lidar_path, "range_orig", f"{seg}_range_orig_seed{opt.seed}.npy"),
        np.stack([depth_orig, int_orig, pitch, yaw]),
    )

    pts_pred, pts_int, beam = rp.range_to_pcd(depth_final, pitch, yaw, int_final)
    pred_points = np.concatenate(
        [pts_pred, pts_int[:, None], beam[:, None]], axis=1
    ).astype(np.float32)
    np.save(os.path.join(sample_path, lid["file_name"][i]), pred_points)

    # lidar-on-image overlays (reference :633-652)
    if image_recon is not None and "orig" in batch.get("image", {}):
        from mobi_tpu.viz import overlay_lidar_on_image

        lidar2image = np.asarray(batch["image"]["orig"]["lidar2image"][i])
        pts_orig, _, _ = rp.range_to_pcd(depth_orig, pitch, yaw)
        image_u8 = (
            (np.asarray(batch["image"]["orig"]["image"][i]) + 1) / 2 * 255
        ).astype(np.uint8)
        overlay_lidar_on_image(
            pts_orig, lidar2image, image_u8,
            os.path.join(lidar_path, "overlay_orig", f"{seg}.png"),
        )
        overlay_lidar_on_image(
            pts_pred, lidar2image, image_recon,
            os.path.join(lidar_path, "overlay_pred", f"{seg}.png"),
        )


def save_lidar_visuals(pred, batch, i, lidar_path, seg, opt, cv2):
    """Range-view PNGs for the lidar realism scores + collages
    (reference :536-565): range_depth_{pred,target} and
    range_intensity_{pred,target} hold the normalized 512-crops as u8 — the
    D-LPIPS / I-LPIPS inputs of realism_test_bench.sh compute_scores."""
    from mobi_tpu.viz import range_log_collage

    lid = batch["lidar"]
    gt = np.asarray(lid["range_data"][i])
    inpaint = np.asarray(lid["range_data_inpaint"][i])
    mask = np.asarray(lid["range_mask"][i])

    def u8(x):
        return np.clip((np.asarray(x) + 1) / 2 * 255, 0, 255).astype(np.uint8)

    for ch, name in ((0, "depth"), (1, "intensity")):
        for sub, img in (
            (f"range_{name}_pred", u8(pred[..., ch])),
            (f"range_{name}_target", u8(gt[..., ch])),
        ):
            os.makedirs(os.path.join(lidar_path, sub), exist_ok=True)
            cv2.imwrite(
                os.path.join(lidar_path, sub, f"{seg}_seed{opt.seed}.png"), img
            )
        collage = range_log_collage(gt, inpaint, mask, np.asarray(pred), channel=ch)
        coldir = os.path.join(lidar_path, f"range_{name}_collage")
        os.makedirs(coldir, exist_ok=True)
        cv2.imwrite(
            os.path.join(coldir, f"{seg}_grid_{name}_seed{opt.seed}.jpg"), collage
        )


def save_camera_grid(pred, batch, i, camera_path, seg, opt, cv2):
    """input | inpaint | reference | prediction collage (:470-477)."""
    from mobi_tpu.models.clip import CLIP_IMAGE_MEAN, CLIP_IMAGE_STD

    gt = ((np.asarray(batch["image"]["GT"][i]) + 1) / 2 * 255).astype(np.uint8)
    inp = ((np.asarray(batch["image"]["inpaint_image"][i]) + 1) / 2 * 255).astype(
        np.uint8
    )
    ref = np.asarray(batch["image"]["cond"]["ref_image"][i])
    ref = np.clip(
        (ref * np.asarray(CLIP_IMAGE_STD) + np.asarray(CLIP_IMAGE_MEAN)) * 255, 0, 255
    ).astype(np.uint8)
    ref = cv2.resize(ref, (gt.shape[1], gt.shape[0]))
    pr = ((pred + 1) / 2 * 255).astype(np.uint8)
    grid = np.concatenate([gt, inp, ref, pr], axis=0)
    os.makedirs(os.path.join(camera_path, "grid"), exist_ok=True)
    cv2.imwrite(
        os.path.join(camera_path, "grid", f"{seg}_grid_seed{opt.seed}.jpg"),
        grid[..., ::-1],
    )


if __name__ == "__main__":
    main()
