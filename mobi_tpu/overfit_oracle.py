"""Overfit learning oracle: prove train -> sample LEARNS to inpaint.

Module-level golden parity pins every block against the torch reference,
and training evidence shows loss descent — but neither demonstrates the
composition: that a model trained by THIS trainer produces correct inpaints
through THIS sampler. The reference's de-facto oracle is its realism bench
against published checkpoints (/root/reference/README.md:155-160,
scripts/realism_test_bench.sh), which cannot run without the artifacts.
This harness replaces it with a closed-loop test that needs no artifacts:

  1. fabricate a FIXED tiny set of synthetic objects (distinct textures at
     known box regions, camera + lidar, id-ref conditioning);
  2. overfit the VAEs on those frames (the reference assumes pretrained
     frozen VAEs; here they must be learned first so pixel-space
     comparisons are meaningful);
  3. overfit the diffusion model (full-UNet mode) on the same set;
  4. sample inpaints for the SAME objects through the production pipeline
     (get_input -> scanned DDIM -> decode_sample) and gate on
     masked-region reconstruction: the sampled inpaint must beat the
     do-nothing baseline (the blanked hole) and the untrained-model
     baseline by a wide margin, and clear an absolute PSNR bar.

Used by tests/test_overfit_oracle.py (CPU-sized gate in the suite) and
scripts/overfit_oracle_drive.py (the v5e drive at mini-256 scale).
"""
from __future__ import annotations

import os
from functools import partial
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

Params = Any


def live_hbm_gb() -> float:
    """Sum of live device-array bytes in this client (diagnostic; logged
    between oracle phases so OOMs in the drive log come with data)."""
    return sum(
        int(np.prod(a.shape)) * a.dtype.itemsize for a in jax.live_arrays()
    ) / 2**30


# ----------------------------------------------------------------- dataset
def make_object_set(
    n_objects: int = 4,
    h: int = 32,
    w: int = 32,
    box: Tuple[int, int, int, int] | None = None,
    seed: int = 0,
    ref_hw: Tuple[int, int] | None = None,
) -> Dict[str, Any]:
    """A fixed batch of `n_objects` synthetic inpainting problems.

    Each sample: a smooth background with a distinct blocky texture
    ("object") inside a fixed box; inpaint_mask is 0 inside the box
    (reference mask semantics: inpaint_image = GT * mask, the hole to
    fill); the reference crop is the object patch itself resized to the
    frame (id-ref); ref_bbox is the box's 8 corners with the object's
    depth. Lidar range_data carries the same texture in (depth,
    intensity) channels so the joint model must fill both modalities.
    """
    rng = np.random.default_rng(seed)
    if box is None:
        q_h, q_w = h // 4, w // 4
        box = (q_h, 3 * q_h, q_w, 3 * q_w)  # (y0, y1, x0, x1) — centered
    y0, y1, x0, x1 = box
    f32 = np.float32

    def blocky(shape, cells=4):
        """Distinct per-object texture: random cells upsampled to shape."""
        small = rng.uniform(-1, 1, (cells, cells, shape[-1])).astype(f32)
        reps = (shape[0] // cells, shape[1] // cells)
        return np.repeat(np.repeat(small, reps[0], 0), reps[1], 1)

    gts, masks, refs, bboxes = [], [], [], []
    gts_l, masks_l = [], []
    for i in range(n_objects):
        # smooth background: horizontal+vertical gradients, object-specific
        yy, xx = np.mgrid[0:h, 0:w].astype(f32)
        bg = np.stack(
            [
                0.4 * np.sin(2 * np.pi * (xx / w + i / n_objects)),
                0.4 * np.cos(2 * np.pi * yy / h),
                np.full((h, w), -0.2 + 0.1 * i, f32),
            ],
            axis=-1,
        ).astype(f32)
        gt = bg.copy()
        obj = blocky((y1 - y0, x1 - x0, 3))
        gt[y0:y1, x0:x1] = obj
        mask = np.ones((h, w, 1), f32)
        mask[y0:y1, x0:x1] = 0.0

        # id-ref: the object crop itself, resized to the ref frame by
        # nearest-neighbor indexing (keeps this module cv2-free).
        # ref_hw sizes it for the conditioning tower (224 for the real
        # CLIP ViT-L, frame-sized by default for the tiny test tower)
        rh, rw = ref_hw or (h, w)
        ry = np.clip((np.arange(rh) * (y1 - y0)) // rh, 0, y1 - y0 - 1)
        rx = np.clip((np.arange(rw) * (x1 - x0)) // rw, 0, x1 - x0 - 1)
        refs.append(obj[np.ix_(ry, rx)])

        depth = 0.3 + 0.1 * i
        corners = np.array(
            [
                [x / w, y / h, depth]
                for y in (y0, y1)
                for x in (x0, x1)
            ] * 2,
            f32,
        )  # 8 corners (duplicated front/back face at equal depth)
        bboxes.append(corners)

        gt_l = np.stack(
            [0.3 * np.sin(2 * np.pi * xx / w), np.full((h, w), -0.5, f32)],
            axis=-1,
        ).astype(f32)
        gt_l[y0:y1, x0:x1] = blocky((y1 - y0, x1 - x0, 2))
        gts.append(gt)
        masks.append(mask)
        gts_l.append(gt_l)
        masks_l.append(mask.copy())

    gt = np.stack(gts)
    mask = np.stack(masks)
    gt_l = np.stack(gts_l)
    mask_l = np.stack(masks_l)
    ref = np.stack(refs)
    bbox = np.stack(bboxes)
    return {
        "image": {
            "GT": gt,
            "inpaint_image": gt * mask,
            "inpaint_mask": mask,
            "cond": {"ref_image": ref, "ref_bbox": bbox},
        },
        "lidar": {
            "range_data": gt_l,
            "range_data_inpaint": gt_l * mask_l,
            "range_mask": mask_l,
            "cond": {"ref_bbox": bbox.copy()},
        },
    }


# ------------------------------------------------------------- VAE overfit
def overfit_vaes(
    model,
    params: Params,
    batch: Dict[str, Any],
    steps: int = 400,
    lr: float = 1.5e-3,
    kl_weight: float = 1e-4,
    seed: int = 0,
    log_every: int = 0,
    minibatch: int = 0,
) -> Tuple[Params, Dict[str, float]]:
    """Overfit vae_camera and vae_lidar on the object set's frames
    (GT + inpaint views) with L1 + tiny KL (the reference's pretrained
    frozen stages stand in for this step in production,
    ddpm.py:546-562). Returns updated params + final recon L1s.

    minibatch > 0 trains on a random `minibatch`-sized slice of the frames
    per step — the full-frame VAE backward at 256+ resolution blows HBM at
    full frame count on a 16 GB chip (ResourceExhausted, measured)."""
    jobs = [
        ("vae_camera", model.vae_camera,
         np.concatenate([batch["image"]["GT"],
                         batch["image"]["inpaint_image"]])),
        ("vae_lidar", model.vae_lidar,
         np.concatenate([batch["lidar"]["range_data"],
                         batch["lidar"]["range_data_inpaint"]])),
    ]
    params = dict(params)
    finals: Dict[str, float] = {}
    for name, vae, x_np in jobs:
        n = x_np.shape[0]
        mb = min(minibatch, n) if minibatch else n
        # cosine tail: constant-lr minibatch training plateaus noisily
        # (mini-256 camera trace 0.15 -> 0.18 -> 0.098 over 400 steps);
        # the VAE round-trip is the PSNR ceiling of the whole oracle, so
        # converging it matters 1:1 for the gate margin
        tx = optax.adam(
            optax.cosine_decay_schedule(lr, max(steps, 1), alpha=0.05)
        )

        def loss_fn(vp, x, rng):
            post = vae.apply({"params": vp}, x, method=vae.encode)
            z = post.sample(rng)
            rec = vae.apply({"params": vp}, z, method=vae.decode)
            l1 = jnp.abs(rec - x).mean()
            kl = post.kl().mean() / float(np.prod(x.shape[1:]))
            return l1 + kl_weight * kl, l1

        # donate params+opt: without aliasing, input and output trees
        # coexist across the step boundary and the run OOMs even though
        # the compile fit (same rule as train.py:284-292, PROFILE.md
        # "donate_argnums on the train step")
        @partial(jax.jit, donate_argnums=(0, 1))
        def step_fn(vp, opt_state, x, rng):
            (_, l1), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                vp, x, rng
            )
            updates, opt_state = tx.update(grads, opt_state, vp)
            return optax.apply_updates(vp, updates), opt_state, l1

        vp = params[name]
        opt_state = tx.init(vp)
        key = jax.random.PRNGKey(seed)
        sel = np.random.default_rng(seed)
        for i in range(steps):
            key, sub = jax.random.split(key)
            # host-side selection: upload only the minibatch, never hold
            # a gathered copy of the full frame set on device
            x = jnp.asarray(
                x_np if mb == n
                else x_np[sel.choice(n, size=mb, replace=False)]
            )
            vp, opt_state, l1 = step_fn(vp, opt_state, x, sub)
            if (i + 1) % 25 == 0:
                # bound in-flight executes on the tunneled runtime
                l1.block_until_ready()
            if log_every and (i + 1) % log_every == 0:
                print(f"  [{name}] step {i + 1}: recon L1 {float(l1):.4f}",
                      flush=True)
        params[name] = vp
        finals[name] = float(l1)
        # drop the job's optimizer state and compiled executables before
        # the next job compiles: on a 16 GB chip with the full mini-256
        # model resident the second job's first execute otherwise lands on
        # top of job-1 leftovers (ResourceExhausted, measured)
        del opt_state, vp, l1
        jax.clear_caches()
        if log_every:
            print(f"  [{name}] done; live device GB {live_hbm_gb():.2f}",
                  flush=True)
    return params, finals


# -------------------------------------------------------- diffusion overfit
def overfit_diffusion(
    model,
    params: Params,
    batch: Dict[str, Any],
    steps: int = 600,
    lr: float = 3e-4,
    seed: int = 0,
    log_every: int = 0,
    train_step=None,
    state=None,
    optimizer: str = "adamw",
    cosine_decay: bool = False,
    randomize_zero_init: bool = False,
    adam_mu_dtype=None,
) -> Tuple[Params, Dict[str, float]]:
    """Overfit the FULL UNet (MOBI_TRAIN_UNET_FULL, beyond the reference's
    adapter-only rule — required from random init, where the zero-init
    out_conv blocks adapter-only gradients) on the fixed object set.
    Pass (train_step, state) to reuse caller-built sharded machinery.
    optimizer="adafactor" fits the full-UNet mini-256 step in 16 GB HBM
    (AdamW's fp32 slots alone are ~7.8 GB there). cosine_decay anneals the
    lr to lr/20 over `steps` — constant-lr adafactor at overfit rates goes
    unstable late (mini-256 drive: loss 0.11 at step 800 -> 1.01 at 1400)."""
    import optax as _optax

    from mobi_tpu.training import create_train_state, make_train_step

    if state is not None and (
        optimizer != "adamw" or cosine_decay or randomize_zero_init
        or adam_mu_dtype is not None
    ):
        # the caller-built (train_step, state) already baked in its own
        # optimizer; silently ignoring these would train something other
        # than what the call site reads
        raise ValueError(
            "optimizer/cosine_decay/randomize_zero_init/adam_mu_dtype "
            "require overfit_diffusion to build the train state itself — "
            "do not combine them with a caller-provided `state`"
        )

    if randomize_zero_init:
        # Same knob as train.py's MOBI_RANDOMIZE_ZERO_INIT (train.py:230-251):
        # the reference zero-initializes EVERY ResBlock/transformer output
        # conv plus the final out_conv (zero_module, openaimodel.py:833-837),
        # so a from-scratch full-UNet sits on a deep saddle — eps_hat == 0
        # exactly, and escape via the out_conv-first cascade is chaotic at
        # scale (mini-256: 3 seeded runs escaped at step 600 / 1800 / never).
        # The reference never faces this: it always finetunes from PbE
        # weights where these convs are non-zero. Perturbing the all-zero
        # leaves reproduces that starting condition. Scope: ONLY the UNet
        # partition (the zero_module convs all live there) — frozen
        # VAE/CLIP/cond partitions must never be mutated even if some leaf
        # of theirs were legitimately zero.
        zrng = np.random.default_rng(seed)

        # zero-check ON DEVICE (one jitted program, scalar flags): a host
        # `np.any(np.asarray(x))` per leaf pulls the whole ~6 GB tree
        # through the tunnel (~15 min, measured); this fetches bools
        is_zero = jax.device_get(jax.jit(
            lambda t: jax.tree_util.tree_map(
                lambda x: jnp.all(x == 0) if getattr(x, "ndim", 0) >= 2
                else jnp.asarray(False), t)
        )(params["unet"]))

        def _bump(x, z):
            if bool(z):
                return jnp.asarray(
                    zrng.normal(0, 0.02, x.shape).astype(np.float32)
                ).astype(x.dtype)
            return x

        params = dict(params)
        params["unet"] = jax.tree_util.tree_map(
            _bump, params["unet"], is_zero
        )

    prev = os.environ.get("MOBI_TRAIN_UNET_FULL")
    os.environ["MOBI_TRAIN_UNET_FULL"] = "1"
    try:
        if state is None:
            jax.clear_caches()  # drop prior phases' executables first
            schedule = (
                _optax.warmup_cosine_decay_schedule(
                    0.0, lr, min(200, steps // 4), steps, lr / 20.0
                ) if cosine_decay else None
            )
            state, tx = create_train_state(
                model, jax.random.PRNGKey(seed), base_lr=lr, params=params,
                optimizer=optimizer, schedule=schedule,
                adam_mu_dtype=adam_mu_dtype,
            )
            # donated, like the production trainer (train.py:284-292):
            # un-aliased params+opt in/out trees OOM a 16 GB chip
            train_step = jax.jit(
                make_train_step(model, tx), donate_argnums=(0,)
            )
        key = jax.random.PRNGKey(seed + 1)
        dev_batch = jax.tree.map(jnp.asarray, batch)
        loss = float("nan")
        window: list = []  # device scalar dicts; fetched only at log points
        per_mod = model.config.multimodal
        for i in range(steps):
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, dev_batch, sub)
            window.append(metrics)
            if (i + 1) % 25 == 0:
                jax.block_until_ready(metrics["loss"])
            if log_every and (i + 1) % log_every == 0:
                # the per-step loss swings with the sampled timestep; the
                # window mean is the signal (instability shows as a rising
                # mean, not one high draw). The camera/lidar split exposes
                # which modality an asymmetric plateau lives in.
                mean = float(np.mean([float(m["loss"]) for m in window]))
                split = ""
                if per_mod and "loss_camera" in window[-1]:
                    c = float(np.mean(
                        [float(m["loss_camera"]) for m in window]))
                    l = float(np.mean(
                        [float(m["loss_lidar"]) for m in window]))
                    split = f" cam {c:.4f} lid {l:.4f}"
                print(
                    f"  [diffusion] step {i + 1}: loss "
                    f"{float(metrics['loss']):.4f} "
                    f"(mean{len(window)} {mean:.4f}{split})",
                    flush=True,
                )
                window = []
        loss = float(metrics["loss"])
    finally:
        if prev is None:
            os.environ.pop("MOBI_TRAIN_UNET_FULL", None)
        else:
            os.environ["MOBI_TRAIN_UNET_FULL"] = prev
    return state.params, {"final_loss": loss}


def latent_stats(model, params: Params, batch: Dict[str, Any]) -> Dict[str, float]:
    """Per-modality statistics of the SCALED GT latents the diffusion model
    trains on (z = scale_factor * encode(GT).mode()).

    Diagnostic for the lidar-vs-ceiling gap: the reference's scale_factor
    0.18215 was calibrated so SD-VAE latents are ~unit-std
    (ddpm.py scale_factor config); a freshly-overfit VAE has no such
    guarantee, and a modality whose z0 std is far from 1 mismatches the
    N(0,1) prior the sampler starts from."""

    def enc(vae, vp, x, scale):
        post = vae.apply({"params": vp}, x, method=vae.encode)
        return scale * post.mode()

    z_c = np.asarray(jax.jit(enc, static_argnums=0)(
        model.vae_camera, params["vae_camera"],
        jnp.asarray(batch["image"]["GT"]), model.config.scale_factor))
    z_l = np.asarray(jax.jit(enc, static_argnums=0)(
        model.vae_lidar, params["vae_lidar"],
        jnp.asarray(batch["lidar"]["range_data"]),
        model.config.lidar_scale_factor))
    return {
        "camera_z_std": float(z_c.std()),
        "camera_z_mean": float(z_c.mean()),
        "camera_z_absmax": float(np.abs(z_c).max()),
        "lidar_z_std": float(z_l.std()),
        "lidar_z_mean": float(z_l.mean()),
        "lidar_z_absmax": float(np.abs(z_l).max()),
    }


def sample_latent_mse(
    model,
    params: Params,
    batch: Dict[str, Any],
    num_steps: int = 20,
    seed: int = 7,
    guidance_scale: float = 1.0,
    sampler: str = "ddim",
) -> Dict[str, float]:
    """Latent-space error of the sampler per modality: MSE between the
    sampled 4-ch latents and the mode-encoded GT latents, plus the same
    normalized by the GT latent variance (a decoder-independent SNR).

    Separates the two explanations for a pixel-PSNR gap: large normalized
    lidar latent MSE => the DIFFUSION model is not matching the lidar
    latents; small latent MSE but poor pixel PSNR => the lidar DECODER
    amplifies small latent errors."""

    def run(p, b, key):
        data = model.get_input(p, b, key, encode_cond=True,
                               deterministic=True)
        lat = model.sample(
            p, data, jax.random.fold_in(key, 1), num_steps=num_steps,
            guidance_scale=guidance_scale, sampler=sampler,
        )
        return lat, data["z"][..., :4]

    lat, z_gt = jax.jit(run)(
        params, jax.tree.map(jnp.asarray, batch), jax.random.PRNGKey(seed)
    )
    lat, z_gt = np.asarray(lat, np.float64), np.asarray(z_gt, np.float64)
    if model.config.multimodal:
        mods = {"camera": (lat[0::2], z_gt[0::2]),
                "lidar": (lat[1::2], z_gt[1::2])}
    else:
        name = "camera" if model.config.use_camera else "lidar"
        mods = {name: (lat, z_gt)}
    out: Dict[str, float] = {}
    for name, (s, g) in mods.items():
        mse = float(((s - g) ** 2).mean())
        out[f"{name}_latent_mse"] = mse
        out[f"{name}_latent_mse_rel"] = mse / max(float(g.var()), 1e-12)
    return out


def vae_ceiling(model, params: Params, batch: Dict[str, Any]) -> Dict[str, float]:
    """Masked-region PSNR of the pure VAE round-trip (deterministic mode
    encode -> decode) — the hard ceiling on what ANY latent-space sampler
    can score against pixel GT. Reporting it next to the gate turns
    'camera 11.73 dB' into its real meaning: the mini-256 drive sampled
    within 0.06 dB of its 11.79 dB ceiling — the diffusion model had
    learned the latents essentially perfectly and the VAE was the limit."""

    def rt(vae, vp, x):
        post = vae.apply({"params": vp}, x, method=vae.encode)
        return vae.apply({"params": vp}, post.mode(), method=vae.decode)

    gt_c = np.asarray(batch["image"]["GT"])
    gt_l = np.asarray(batch["lidar"]["range_data"])
    rec_c = np.asarray(jax.jit(rt, static_argnums=0)(
        model.vae_camera, params["vae_camera"], jnp.asarray(gt_c)))
    rec_l = np.asarray(jax.jit(rt, static_argnums=0)(
        model.vae_lidar, params["vae_lidar"], jnp.asarray(gt_l)))
    return {
        "camera_ceiling_psnr": masked_psnr(
            rec_c, gt_c, 1.0 - np.asarray(batch["image"]["inpaint_mask"])),
        "lidar_ceiling_psnr": masked_psnr(
            rec_l, gt_l, 1.0 - np.asarray(batch["lidar"]["range_mask"])),
    }


# ---------------------------------------------------------------- the gate
def masked_psnr(pred: np.ndarray, gt: np.ndarray, region: np.ndarray) -> float:
    """PSNR over region==1 pixels only (peak 2.0 for [-1, 1] data)."""
    pred, gt = np.asarray(pred, np.float64), np.asarray(gt, np.float64)
    region = np.broadcast_to(np.asarray(region, np.float64), gt.shape)
    mse = float((((pred - gt) * region) ** 2).sum() / region.sum())
    return 10.0 * np.log10(4.0 / max(mse, 1e-12))


def sample_and_score(
    model,
    params: Params,
    batch: Dict[str, Any],
    num_steps: int = 20,
    seed: int = 7,
    pipeline=None,
    guidance_scale: float = 1.0,
    sampler: str = "ddim",
    sample_segments: int = 1,
) -> Dict[str, float]:
    """Sample inpaints for the object set and score masked-region
    reconstruction vs GT, next to the do-nothing baseline (the blanked
    hole the model starts from).

    guidance_scale/sampler/sample_segments select the production protocol:
    the reference samples every bench at CFG scale 5 with PLMS-50
    (scripts/realism_test_bench.sh; plms.py:174-239) — scoring the oracle
    there proves the uncond vectors trained under CFG dropout GUIDE rather
    than garble, which loss descent alone cannot show."""
    from mobi_tpu.pipeline import make_inpaint_pipeline

    if pipeline is None:
        pipeline = make_inpaint_pipeline(
            model, num_steps=num_steps, guidance_scale=guidance_scale,
            sampler=sampler, deterministic_encode=True,
            sample_segments=sample_segments,
        )
    out = pipeline(params, batch, jax.random.PRNGKey(seed))
    out = {k: np.asarray(v) for k, v in out.items()}

    region_c = 1.0 - np.asarray(batch["image"]["inpaint_mask"])
    region_l = 1.0 - np.asarray(batch["lidar"]["range_mask"])
    gt_c = np.asarray(batch["image"]["GT"])
    gt_l = np.asarray(batch["lidar"]["range_data"])
    return {
        "camera_psnr": masked_psnr(out["camera"], gt_c, region_c),
        "camera_psnr_baseline": masked_psnr(
            np.asarray(batch["image"]["inpaint_image"]), gt_c, region_c
        ),
        "lidar_psnr": masked_psnr(out["lidar"], gt_l, region_l),
        "lidar_psnr_baseline": masked_psnr(
            np.asarray(batch["lidar"]["range_data_inpaint"]), gt_l, region_l
        ),
        "lidar_depth_mse": float(
            (((out["lidar"][..., 0] - gt_l[..., 0])
              * region_l[..., 0]) ** 2).sum() / region_l[..., 0].sum()
        ),
    }
