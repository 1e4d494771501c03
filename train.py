"""MObI-TPU training driver.

CLI-parity with the reference /root/reference/main.py:451-729:

  python train.py --base configs/mobi_nusc_512.yaml \
      [--pretrained_model checkpoints/model.ckpt] [--resume LOGDIR] \
      [--seed 23] [--scale_lr] [--max_steps N] [--logdir logs] \
      [name.dotted.key=value ...]

TPU-native execution model: one SPMD program over a dp x fsdp mesh; gradient
all-reduce is implicit in the sharded jit; host data pipeline feeds
fixed-shape NHWC numpy batches. LR scaling rule mirrors main.py:690-694
(lr = accumulate * num_devices * batch_size * base_lr when --scale_lr).
"""
from __future__ import annotations

import argparse
import os
import sys
import time
from datetime import datetime

import numpy as np


def parse_args(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--base", nargs="*", default=[], help="base config yaml(s)")
    p.add_argument("--pretrained_model", default=None,
                   help="torch .ckpt or orbax dir to initialize from")
    p.add_argument("--resume", default=None, help="logdir to resume from")
    p.add_argument("--logdir", default="logs")
    p.add_argument("--name", default=None)
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--scale_lr", action="store_true")
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--max_epochs", type=int, default=None)
    p.add_argument("--accumulate_grad_batches", type=int, default=1)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--val_every", type=int, default=1000)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--image_log_every", type=int, default=400,
                   help="sampled image/range collage frequency "
                        "(reference ImageLogger batch_frequency, main.py:604)")
    p.add_argument("--image_log_steps", type=int, default=20,
                   help="sampler steps for logged images")
    p.add_argument("--image_log_max", type=int, default=2,
                   help="max (camera, lidar) pairs per collage dump")
    p.add_argument("--save_top_k", type=int, default=5)
    p.add_argument("--num_workers", type=int, default=4)
    p.add_argument("--loader_procs", type=int, default=0,
                   help="spawned process loader workers (torch num_workers "
                        "analogue for multi-core hosts); 0 = thread workers")
    p.add_argument("--fsdp", type=int, default=1)
    p.add_argument("--optimizer", default="adamw",
                   choices=["adamw", "adafactor"],
                   help="adamw = reference parity (main.py AdamW); "
                        "adafactor = factored second moment, the TPU HBM "
                        "lever when Adam's fp32 slots don't fit (full-UNet "
                        "training on a 16 GB chip)")
    p.add_argument("--platform", default=None, choices=["cpu"],
                   help="force the jax platform (cpu smoke runs on a machine "
                        "whose default backend is a TPU)")
    # multi-process (multi-host) runtime — the reference's nodes x gpus DDP
    # (main.py:510, scripts/train.sh). On a TPU pod slice all three are
    # autodetected (pass --num_processes -1 to force argless initialize);
    # on CPU/localhost pass them explicitly. batch_size stays per-process.
    p.add_argument("--coordinator", default=None,
                   help="coordinator address host:port for "
                        "jax.distributed.initialize")
    p.add_argument("--num_processes", type=int, default=None)
    p.add_argument("--process_id", type=int, default=None)
    p.add_argument("--profile-dir", default=None,
                   help="capture a jax profiler trace of steps 10-15 into "
                        "this directory (tensorboard-compatible)")
    args, unknown = p.parse_known_args(argv)
    return args, unknown


def build_datasets(cfg, split_keys=("train", "validation")):
    from mobi_tpu.utils.config import instantiate_from_config

    data_params = cfg["data"]["params"]
    out = {}
    for k in split_keys:
        if k in data_params and data_params[k]:
            out[k] = instantiate_from_config(data_params[k])
    return out, data_params.get("batch_size", 2)


def main(argv=None):
    args, overrides = parse_args(argv)

    # join the multi-process runtime BEFORE anything touches the backend
    from mobi_tpu.parallel import distributed as dist

    if args.platform == "cpu" and (args.coordinator or args.num_processes):
        import jax as _jax_pre

        _jax_pre.config.update("jax_cpu_collectives_implementation", "gloo")
    dist.initialize(args.coordinator, args.num_processes, args.process_id)

    import jax

    rank0 = dist.is_main_process()
    nproc = dist.process_count()
    if nproc > 1:
        print(f"multi-process run: process {dist.process_index()}/{nproc}")

    from mobi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mobi_tpu.data.loader import PrefetchLoader
    from mobi_tpu.models.diffusion import MobiDiffusion
    from mobi_tpu.parallel.mesh import create_mesh, shard_batch, shard_params
    from mobi_tpu.training import create_train_state, make_train_step
    from mobi_tpu.utils.config import load_config, mobi_config_from_yaml
    from mobi_tpu.checkpoint import (
        CheckpointManager,
        install_crash_save,
        load_torch_checkpoint,
        restore_partial,
    )

    if args.resume:
        logdir = args.resume
        cfg_dir = os.path.join(logdir, "configs")
        bases = sorted(
            os.path.join(cfg_dir, f) for f in os.listdir(cfg_dir) if f.endswith(".yaml")
        )
        cfg = load_config(bases, overrides)
    else:
        cfg = load_config(args.base, overrides)
        now = datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
        name = args.name or os.path.splitext(os.path.basename(args.base[0]))[0]
        logdir = os.path.join(args.logdir, f"{now}_{name}")
        # rank-0 IO convention (reference DDP): only process 0 materializes
        # the run directory; other ranks' (possibly clock-skewed) logdir is
        # never written to.
        if rank0:
            os.makedirs(os.path.join(logdir, "configs"), exist_ok=True)
            import yaml

            with open(os.path.join(logdir, "configs", "merged.yaml"), "w") as f:
                yaml.safe_dump(cfg, f)

    mcfg = mobi_config_from_yaml(cfg)
    model = MobiDiffusion(mcfg)

    # trainer section of the config (reference Trainer args): CLI overrides it
    if args.max_epochs is None:
        args.max_epochs = cfg.get("trainer", {}).get("max_epochs")
    if args.max_steps is None and cfg.get("trainer", {}).get("max_steps"):
        args.max_steps = int(cfg["trainer"]["max_steps"])

    if args.platform:
        devices = jax.devices(args.platform)
        jax.config.update("jax_default_device", devices[0])
    else:
        devices = jax.devices()

    base_lr = cfg["model"].get("base_learning_rate", 8.0e-5)
    datasets, batch_size = build_datasets(cfg)
    n_devices = len(devices)
    if args.scale_lr:
        base_lr = args.accumulate_grad_batches * n_devices * batch_size * base_lr
        print(f"LR scaled to {base_lr} "
              f"(accum {args.accumulate_grad_batches} x dev {n_devices} x bs {batch_size})")

    rng = jax.random.PRNGKey(args.seed)
    # Flagship init executes the full forward eagerly on CPU (~20 min on a
    # 1-core host); cached_init reuses a disk tree keyed by (config, seed)
    # and shape-validated against eval_shape (MOBI_PARAM_CACHE=0 opts out).
    from mobi_tpu.utils.param_cache import cached_init

    init_params = cached_init(
        lambda r: model.init_params(r), rng, repr(mcfg),
        shape_fn=lambda r: model.init_params(r, on_cpu=False),
    )
    state, tx = create_train_state(
        model, rng, base_lr=base_lr,
        accumulate_steps=args.accumulate_grad_batches,
        use_ema=cfg["model"]["params"].get("use_ema", False),
        params=init_params,
        scheduler_config=cfg["model"]["params"].get("scheduler_config"),
        optimizer=args.optimizer,
    )

    ckpt_dir = os.path.join(logdir, "checkpoints")
    # best-checkpoint selection key from the config (reference ModelCheckpoint
    # monitor, main.py:567-580; the shipped configs watch val/loss_simple_ema)
    monitor = cfg["model"]["params"].get("monitor", "val/loss_simple")
    # checkpoints are written by process 0 only, from a gathered host tree
    # (distributed.replicate_to_host); restore reads the same path on every
    # rank (shared filesystem, the reference's DDP assumption).
    mgr = (CheckpointManager(ckpt_dir, max_to_keep=args.save_top_k,
                             monitor=monitor)
           if (rank0 or args.resume) else None)
    if args.resume and mgr.latest_step() is not None:
        state = mgr.restore(template=state)
        print(f"Resumed from step {int(state.step)}")
        resumed = True
    else:
        # reference parity: lidar_stage_config.params.ckpt_path auto-loads
        # the pretrained range autoencoder at construction (ddpm.py:546-562),
        # before any --pretrained_model overlay
        from mobi_tpu.import_torch import import_lidar_stage_from_config

        state = state._replace(
            params=import_lidar_stage_from_config(cfg, state.params)
        )
        resumed = False
    if not resumed and args.pretrained_model:
        print(f"Loading pretrained weights from {args.pretrained_model}")
        sd = load_torch_checkpoint(args.pretrained_model)
        from mobi_tpu.import_torch import import_mobi_checkpoint

        imported = import_mobi_checkpoint(
            sd,
            channel_mult=tuple(mcfg.unet_channel_mult),
            num_res_blocks=mcfg.unet_num_res_blocks,
            attention_resolutions=tuple(mcfg.unet_attention_resolutions),
            vae_resolution=mcfg.image_height,
        )
        params = restore_partial(state.params, imported)
        state = state._replace(params=jax.tree_util.tree_map(
            lambda a: np.asarray(a), params))

    # From-scratch evidence runs only: the reference UNet zero-initializes
    # its final out_conv and every adapter connector, so with adapter-only
    # trainability a from-scratch model has eps_pred = 0 and ZERO gradient
    # flow (the zero out_conv blocks the chain rule) — real runs start from
    # pretrained PbE weights where these are non-zero. This knob perturbs
    # all-zero >=2-D leaves so the training path can be exercised without a
    # published checkpoint. Never on by default.
    if os.environ.get("MOBI_RANDOMIZE_ZERO_INIT", "0") == "1":
        import jax.numpy as _jnp

        zrng = np.random.default_rng(args.seed)

        def _perturb(x):
            if getattr(x, "ndim", 0) >= 2 and not np.any(np.asarray(x)):
                return _jnp.asarray(
                    zrng.normal(0, 0.02, x.shape).astype(np.float32)
                ).astype(x.dtype)
            return x

        state = state._replace(
            params=jax.tree_util.tree_map(_perturb, state.params))
        print("zero-init leaves randomized (MOBI_RANDOMIZE_ZERO_INIT)")

    # Frozen-param bf16 residency (MOBI_TRAIN_BF16_FROZEN=0 opts out): the
    # frozen stages (VAEs, CLIP, UNet backbone) compute in bf16 anyway and
    # never receive updates, so keeping their >=2-D weights fp32 on device
    # only burns HBM — ~2.5 GB at the 512 config, the difference between
    # OOM (15.86G needed) and fitting the 15.75G v5e (PROFILE.md). Norm
    # scales/biases (1-D) stay fp32; trainable leaves stay fp32 (optimizer
    # masters).
    import jax.numpy as jnp

    if (mcfg.dtype == jnp.bfloat16
            and os.environ.get("MOBI_TRAIN_BF16_FROZEN", "1") == "1"):
        fmask = model.trainable_mask(state.params)
        state = state._replace(params=jax.tree_util.tree_map(
            lambda x, t: x.astype(jnp.bfloat16)
            if (not t and getattr(x, "ndim", 0) >= 2
                and x.dtype == np.float32)
            else x,
            state.params, fmask,
        ))

    mesh = create_mesh(fsdp=args.fsdp, devices=devices)
    # shard the WHOLE state: params by param_spec, optimizer moments by the
    # same specs (their tree paths embed the param paths), scalars
    # replicated. This both places everything on the global mesh (required
    # before feeding a multi-process jit) and keeps ZeRO-style moment
    # sharding at rest under fsdp > 1.
    state = shard_params(mesh, state)
    try:  # startup HBM telemetry (reference CUDACallback analogue)
        jax.block_until_ready(state.params)
        stats = jax.devices()[0].memory_stats() or {}
        print(
            f"device mem after params+opt transfer: "
            f"{stats.get('bytes_in_use', 0) / 2**30:.2f} GiB in use / "
            f"{stats.get('bytes_limit', 0) / 2**30:.2f} GiB",
            flush=True,
        )
    except Exception:
        pass
    # donate the state: without aliasing, input and output params+opt
    # buffers coexist across the step boundary — 2x the resident tree, the
    # difference between fitting and a run-time ResourceExhausted on the
    # 15.75G v5e at the 512 config.
    step_fn = jax.jit(
        make_train_step(
            model, tx, use_ema=cfg["model"]["params"].get("use_ema", False)
        ),
        donate_argnums=(0,),
    )

    # On a 1-core host more loader threads are strictly worse (GIL + numpy
    # contention, measured in PROFILE.md "Host input-pipeline throughput");
    # clamp to the core count.
    workers = max(1, min(args.num_workers, os.cpu_count() or 1))
    # per-process contiguous slices of a shared seed-deterministic global
    # order (DistributedSampler analogue) — shard_batch reassembles the
    # global array from them on multi-process runs
    shard_kw = dict(shard_index=dist.process_index(), num_shards=nproc,
                    num_procs=args.loader_procs)
    train_loader = PrefetchLoader(
        datasets["train"], batch_size, shuffle=True,
        num_threads=workers, seed=args.seed, **shard_kw,
    )
    val_loader = (
        PrefetchLoader(datasets["validation"], batch_size, shuffle=False,
                       num_threads=workers, **shard_kw)
        if "validation" in datasets else None
    )

    def strip_host_fields(batch):
        keep_img = {"GT", "inpaint_image", "inpaint_mask", "cond"}
        keep_lid = {"range_data", "range_data_inpaint", "range_mask", "cond"}
        out = {
            "image": {k: v for k, v in batch["image"].items() if k in keep_img},
            "lidar": {k: v for k, v in batch["lidar"].items() if k in keep_lid},
        }
        out["image"]["cond"] = dict(batch["image"]["cond"])
        out["lidar"]["cond"] = {"ref_bbox": batch["lidar"]["cond"]["ref_bbox"]}
        return out

    # metrics logger stack (reference main.py:539-563 logger selection):
    # metrics.jsonl always; `lightning.logger` in the config adds csv/wandb.
    # Rank-0 only: other processes log to a null stack.
    from mobi_tpu.utils.loggers import logger_from_config, NullLogger

    metrics_logger = logger_from_config(cfg, logdir) if rank0 else NullLogger()

    def save_state(cur_state, step, metrics=None):
        """Gather (multi-process) and write a checkpoint from process 0."""
        if nproc > 1:
            host_state = dist.replicate_to_host(cur_state, mesh)
        else:
            host_state = jax.device_get(cur_state)
        if mgr is not None and rank0:
            mgr.save(step, host_state, metrics=metrics)

    crash_saved = {"done": False}

    def crash_save():
        if not crash_saved["done"]:
            try:
                # best-effort in multi-process: the gather is a collective,
                # which completes when the failure raised symmetrically on
                # every rank (the usual XLA case) and is skipped otherwise
                save_state(state, int(state.step))
                if mgr is not None and rank0:
                    mgr.wait()
                    print("crash checkpoint written")
            except Exception as e:
                # a step that dies mid-flight leaves `state` pointing at
                # DONATED (already-freed) buffers — nothing to save
                print(f"crash-save skipped: {e}")
            crash_saved["done"] = True

    install_crash_save(crash_save)

    image_logger = ImageLogger(
        model, mcfg, logdir, every=args.image_log_every,
        sample_steps=args.image_log_steps, max_items=args.image_log_max,
        metrics_logger=metrics_logger,
    )

    step = int(state.step)
    max_steps = args.max_steps or (10**12)
    epoch = 0
    t_last = time.time()
    t_epoch = time.time()
    preflighted = False
    try:
        while step < max_steps and (args.max_epochs is None or epoch < args.max_epochs):
            for batch in train_loader:
                batch_dev = shard_batch(mesh, strip_host_fields(batch))
                rng, sub = jax.random.split(rng)
                if not preflighted:
                    # HBM pre-flight of the compiled step: an over-budget
                    # program faults the tunneled device with an opaque
                    # UNAVAILABLE instead of a clean OOM (utils/hbm.py; same
                    # guard bench.py runs on the inference pipeline). The
                    # AOT compile here is the one the first call would pay
                    # anyway (shared persistent cache at worst).
                    preflighted = True
                    from mobi_tpu.utils.hbm import assert_fits
                    try:
                        with mesh:
                            compiled = step_fn.lower(
                                state, batch_dev, sub
                            ).compile()
                    except Exception:
                        compiled = None  # best-effort: the call surfaces it
                    if compiled is not None and assert_fits(
                        compiled, label="train step"
                    ):
                        print("HBM pre-flight ok (train step)", flush=True)
                if args.profile_dir and step == 10:
                    jax.profiler.start_trace(args.profile_dir)
                with mesh:
                    state, m = step_fn(state, batch_dev, sub)
                if args.profile_dir and step == 15:
                    jax.block_until_ready(m["loss"])
                    jax.profiler.stop_trace()
                    print(f"profiler trace written to {args.profile_dir}")
                step += 1
                if step % args.image_log_every == 0:
                    rng, sub = jax.random.split(rng)
                    with mesh:
                        image_logger.maybe_log(
                            state, batch, strip_host_fields, step, sub,
                            mesh=mesh,
                        )
                if step % args.log_every == 0:
                    m = {k: float(v) for k, v in m.items()}
                    dt = time.time() - t_last
                    t_last = time.time()
                    m.update(step=step, epoch=epoch,
                             imgs_per_sec=args.log_every * batch_size
                             * nproc / dt)
                    metrics_logger.log({f"train/{k}" if "/" not in k else k: v
                                        for k, v in m.items()})
                    if rank0:
                        print(f"step {step} loss {m.get('loss'):.4f} "
                              f"({m['imgs_per_sec']:.2f} img/s)")
                if step % args.val_every == 0 and val_loader is not None:
                    # every rank runs the jitted val computation (collective
                    # participation); rank 0 logs and saves
                    vm = validate(model, state, val_loader, strip_host_fields,
                                  mesh, rng)
                    metrics_logger.log(vm, step=step)
                    save_state(state, step, metrics=vm)
                elif step % args.save_every == 0:
                    save_state(state, step,
                               metrics={monitor: float(m.get("loss_simple", 0))})
                if step >= max_steps:
                    break
            epoch += 1
            # epoch wall time + device memory — the reference CUDACallback
            # equivalent (main.py:428-448)
            epoch_rec = {
                "train/epoch": epoch,
                "train/epoch_time_s": time.time() - t_epoch,
                "step": step,
            }
            try:
                stats = jax.devices()[0].memory_stats() or {}
                if "peak_bytes_in_use" in stats:
                    epoch_rec["train/peak_device_mem_mb"] = (
                        stats["peak_bytes_in_use"] / 2**20
                    )
            except Exception:
                pass
            metrics_logger.log(epoch_rec)
            if rank0:
                print(f"epoch {epoch} done in "
                      f"{epoch_rec['train/epoch_time_s']:.1f}s")
            t_epoch = time.time()
    except Exception:
        crash_save()
        raise
    save_state(state, step)
    if mgr is not None and rank0:
        mgr.wait()
    dist.barrier("train_done")
    if rank0:
        print(f"training done at step {step}; checkpoints in {ckpt_dir}")


def validate(model, state, val_loader, strip, mesh, rng, num_batches=8,
             t_draws=4):
    """Validation loss averaged over `t_draws` independent timestep/noise
    draws per batch — the single-draw estimate is far too noisy to drive
    checkpoint selection. Logs both val/loss_simple (live weights) and
    val/loss_simple_ema (EMA weights via ema_scope) like the reference
    validation_step (ddpm.py:370-377); with use_ema off the _ema entry
    equals the live one (the reference's no-op ema_scope) without paying a
    second forward. The shipped configs monitor val/loss_simple_ema
    (mobi_nusc_512.yaml:43)."""
    import jax
    import jax.numpy as jnp

    from mobi_tpu.parallel.mesh import shard_batch
    from mobi_tpu.training import params_with_ema

    def multi_t_loss(p, b, r):
        keys = jax.random.split(r, t_draws)
        losses = jnp.stack(
            [model.training_loss(p, b, k)[1]["loss_simple"] for k in keys]
        )
        return losses.mean()

    eval_loss = jax.jit(multi_t_loss)
    ema_params = params_with_ema(state) if state.ema is not None else None
    losses, losses_ema = [], []
    for i, batch in enumerate(val_loader):
        if i >= num_batches:
            break
        rng, sub = jax.random.split(rng)
        with mesh:
            b = shard_batch(mesh, strip(batch))
            losses.append(float(eval_loss(state.params, b, sub)))
            if ema_params is not None:
                # same rng draw: the EMA delta is isolated from t/noise noise
                losses_ema.append(float(eval_loss(ema_params, b, sub)))
    live = float(np.mean(losses)) if losses else float("nan")
    ema = float(np.mean(losses_ema)) if losses_ema else live
    return {"val/loss_simple": live, "val/loss_simple_ema": ema}


class ImageLogger:
    """Training-time sampled collages + on-line lidar metrics — the
    reference's primary QA surface (main.py:319-425 ImageLogger;
    ddpm.py:1450-1614 log_images/log_data with per-val lidar depth/intensity
    MSE and median error)."""

    def __init__(self, model, mcfg, logdir, every=400, sample_steps=20,
                 max_items=2, metrics_logger=None):
        self.model = model
        self.mcfg = mcfg
        self.dir = os.path.join(logdir, "images")
        self.every = max(int(every), 1)
        self.steps = sample_steps
        self.max_items = max_items
        self.metrics_logger = metrics_logger
        self._fn = None

    def _build(self, mesh=None):
        import jax

        model = self.model

        def pipeline(params, batch, rng):
            k1, k2 = jax.random.split(rng)
            data = model.get_input(params, batch, k1, encode_cond=True)
            latents = model.sample(
                params, data, k2, num_steps=self.steps, guidance_scale=1.0,
                sampler="plms",
            )
            return model.decode_sample(
                params, latents, data.get("z_lidar_full"), data.get("lidar_geom")
            )

        out_shardings = None
        if mesh is not None:
            from mobi_tpu.parallel.mesh import mesh_process_count

            if mesh_process_count(mesh) > 1:
                # multi-process: replicate outputs so rank 0 can fetch them
                from jax.sharding import NamedSharding, PartitionSpec as P

                out_shardings = NamedSharding(mesh, P())
        self._fn = jax.jit(pipeline, out_shardings=out_shardings)

    def maybe_log(self, state, batch, strip, step, rng, mesh=None):
        if step % self.every:
            return None
        import cv2
        import jax

        from mobi_tpu.parallel.mesh import mesh_process_count, shard_batch
        from mobi_tpu.viz import camera_log_collage, range_log_collage

        if self._fn is None:
            self._build(mesh)
        n = self.max_items
        small = jax.tree_util.tree_map(lambda x: x[:n], strip(batch))
        nproc = mesh_process_count(mesh) if mesh is not None else 1
        if nproc > 1:
            # every rank contributes its n items to one global sampling
            # batch (collective participation is mandatory), tiled up so
            # the global axis divides the mesh's dp x fsdp shards; rank 0's
            # real items are global rows [0:n] by process-order concat
            n_shards = mesh.shape["dp"] * mesh.shape["fsdp"]
            local_rows = (
                -(-n * nproc // n_shards) * n_shards
            ) // nproc
            small = jax.tree_util.tree_map(
                lambda x: np.asarray(x)[
                    np.arange(local_rows) % x.shape[0]
                ],
                small,
            )
            small = shard_batch(mesh, small)
        # sample with EMA weights when kept — the reference's
        # `ema_scope("Plotting")` around log_images (ddpm.py:1459)
        from mobi_tpu.training import params_with_ema

        out = self._fn(params_with_ema(state), small, rng)
        if nproc > 1:
            if jax.process_index() != 0:
                jax.block_until_ready(out)
                return None
            out = jax.tree_util.tree_map(
                lambda x: np.asarray(x)[:n], out
            )
        os.makedirs(self.dir, exist_ok=True)

        metrics = {}
        if "camera" in out:
            cam = np.asarray(out["camera"])
            for i in range(cam.shape[0]):
                rows = [
                    np.asarray(batch["image"]["GT"][i]),
                    np.asarray(batch["image"]["inpaint_image"][i]),
                    cam[i],
                ]
                collage = camera_log_collage(rows)
                cv2.imwrite(
                    os.path.join(self.dir, f"step{step:08d}_cam{i}.jpg"),
                    collage[..., ::-1],
                )
        if "lidar" in out:
            lid = np.asarray(out["lidar"])
            for i in range(lid.shape[0]):
                for ch, name in ((0, "depth"), (1, "intensity")):
                    collage = range_log_collage(
                        np.asarray(batch["lidar"]["range_data"][i]),
                        np.asarray(batch["lidar"]["range_data_inpaint"][i]),
                        np.asarray(batch["lidar"]["range_mask"][i]),
                        lid[i], channel=ch,
                    )
                    cv2.imwrite(
                        os.path.join(
                            self.dir, f"step{step:08d}_range_{name}{i}.jpg"
                        ),
                        collage,
                    )
            try:
                from mobi_tpu.eval.lidar_metrics import lidar_sample_metrics

                m = lidar_sample_metrics(
                    pred=lid,
                    gt=np.asarray(batch["lidar"]["range_data"][:n]),
                    instance_mask=np.asarray(
                        batch["lidar"]["range_instance_mask"][:n]
                    ),
                    edit_mask=np.asarray(batch["lidar"]["range_mask"][:n]),
                    width_crop=np.asarray(batch["lidar"]["width_crop"][:n]),
                    min_depth_obj=np.asarray(batch["lidar"]["min_depth_obj"][:n]),
                    max_depth_obj=np.asarray(batch["lidar"]["max_depth_obj"][:n]),
                    range_object_norm=self.mcfg.range_object_norm,
                    range_object_norm_scale=self.mcfg.range_object_norm_scale,
                    range_int_norm=self.mcfg.range_int_norm,
                )
                metrics = {f"imagelog/{k}": float(v) for k, v in m.items()}
            except KeyError:
                pass  # host-side fields absent (e.g. synthetic batches)
        if metrics and self.metrics_logger:
            self.metrics_logger.log(metrics, step=step)
        return metrics


if __name__ == "__main__":
    main()
