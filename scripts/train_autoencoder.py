"""Range-view KL-VAE adapter finetuning (GAN) — the reference's
`finetune_autonecoder.sh` path (/root/reference/ldm/models/autoencoder.py:96-147):
only `*lidar*` VAE params train (Adam, betas (0.5, 0.9)), the discriminator
trains with its own optimizer, alternating generator/discriminator steps.

  python scripts/train_autoencoder.py --base configs/range_autoencoder.yaml \
      [--pretrained_model <torch ckpt>] [--max_steps N]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from datetime import datetime

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--base", nargs="*", required=True)
    p.add_argument("--pretrained_model", default=None)
    p.add_argument("--logdir", default="logs")
    p.add_argument("--seed", type=int, default=23)
    p.add_argument("--max_steps", type=int, default=None)
    p.add_argument("--log_every", type=int, default=50)
    p.add_argument("--save_every", type=int, default=1000)
    p.add_argument("--num_workers", type=int, default=4)
    args, overrides = p.parse_known_args(argv)

    import jax
    import jax.numpy as jnp
    import optax

    from mobi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()

    from mobi_tpu.checkpoint import CheckpointManager, load_torch_checkpoint
    from mobi_tpu.data.loader import PrefetchLoader
    from mobi_tpu.models.losses import (
        LidarWithDiscriminator,
        LPIPSWithDiscriminator,
    )
    from mobi_tpu.models.vae import AutoencoderKL
    from mobi_tpu.utils.config import instantiate_from_config, load_config

    cfg = load_config(args.base, [s for s in overrides if "=" in s])
    mp = cfg["model"]["params"]
    dd = mp["ddconfig"]
    vae = AutoencoderKL(
        embed_dim=mp.get("embed_dim", 4),
        ch=dd.get("ch", 128),
        ch_mult=tuple(dd.get("ch_mult", (1, 2, 4, 4))),
        num_res_blocks=dd.get("num_res_blocks", 2),
        attn_resolutions=tuple(dd.get("attn_resolutions", ())),
        resolution=dd.get("resolution", 512),
        z_channels=dd.get("z_channels", 4),
        out_ch=dd.get("out_ch", 2),
        lidar_adapter=dd.get("lidar_adapter", False),
        # remat per block: the 512^2 GAN step stores ~65G of activations
        # without it (measured on the v5e) — far beyond one chip's HBM
        use_checkpoint=dd.get("use_checkpoint", True),
    )
    lossconfig = mp.get("lossconfig", {})
    loss_cfg = dict(lossconfig.get("params", {}))
    # camera VAE finetuning uses the LPIPS-augmented loss (contperceptual.py);
    # the range VAE uses the plain L1+KL+GAN loss (lidarperceptual.py)
    loss_cls = (
        LPIPSWithDiscriminator
        if "LPIPS" in lossconfig.get("target", "")
        else LidarWithDiscriminator
    )
    loss = loss_cls(**{**loss_cfg, "disc_in_channels": dd["in_channels"]})

    rng = jax.random.PRNGKey(args.seed)
    cpu = jax.devices("cpu")[0]
    with jax.default_device(cpu):
        x0 = jnp.zeros((1, dd["resolution"], dd["resolution"], dd["in_channels"]))
        vae_params = vae.init(rng, x0, rng)["params"]
        loss_params = loss.init_params(rng, spatial=dd["resolution"])

    if args.pretrained_model:
        from mobi_tpu.import_torch import import_vae, merge_imported, _strip_prefix

        sd = load_torch_checkpoint(args.pretrained_model)
        # accept either a bare AutoencoderKL ckpt or a LatentDiffusion one
        bare = sd if "encoder.conv_in.weight" in sd or "encoder.conv_in_lidar.weight" in sd else _strip_prefix(sd, "first_stage_model.")
        imported = import_vae(
            bare, ch_mult=tuple(dd["ch_mult"]), num_res_blocks=dd["num_res_blocks"],
            resolution=dd["resolution"], lidar_adapter=dd.get("lidar_adapter", False),
        )
        vae_params = merge_imported(vae_params, imported)
        print(f"initialized VAE from {args.pretrained_model}")

    base_lr = cfg["model"].get("base_learning_rate", 4.5e-6)
    bs = cfg["data"]["params"].get("batch_size", 4)
    lr = base_lr * bs  # reference scales AE lr by batch size

    # adapter-only mask: params whose path contains "lidar"
    def mask_fn(params):
        return jax.tree_util.tree_map_with_path(
            lambda kp, _: any("lidar" in str(getattr(k, "key", k)) for k in kp),
            params,
        )

    # optax.masked passes unmasked updates through UNCHANGED — explicitly
    # zero the frozen complement or the full VAE would drift (same fix as
    # mobi_tpu.training.make_optimizer)
    g_mask = mask_fn(vae_params)
    tx_g = optax.chain(
        optax.masked(
            optax.set_to_zero(),
            jax.tree_util.tree_map(lambda m: not m, g_mask),
        ),
        optax.masked(optax.adam(lr, b1=0.5, b2=0.9), g_mask),
    )
    tx_d = optax.adam(lr, b1=0.5, b2=0.9)
    opt_g = tx_g.init(vae_params)
    opt_d = tx_d.init(loss_params["discriminator"])

    def last_conv(vp):
        dec = vp["decoder"]
        name = "conv_out_lidar" if "conv_out_lidar" in dec else "conv_out"
        return dec[name]["Conv_0"], name

    def g_loss_fn(vp, lp, batch_x, key, step):
        posterior = vae.apply({"params": vp}, batch_x, method=vae.encode)
        z = posterior.sample(key)
        rec, h_pre = vae.apply({"params": vp}, z, True, method=vae.decode)

        # Adaptive disc weight (reference autoencoder.py:116-124): grads of
        # the nll and gan losses w.r.t. the decoder's LAST kernel. The loss
        # depends on that kernel only through the final conv, whose input
        # h_pre is constant w.r.t. it — so replaying just the final conv on
        # a stop-gradiented h_pre reproduces torch's
        # autograd.grad(loss, last_layer) EXACTLY without re-running the
        # decoder (the earlier full-recon formulation cost two extra decoder
        # passes and pushed the 512 GAN step past one chip's HBM).
        h_sg = jax.lax.stop_gradient(h_pre)
        post_sg = jax.tree_util.tree_map(
            jax.lax.stop_gradient, posterior
        )
        conv, name = last_conv(vp)
        bias_sg = jax.lax.stop_gradient(conv["bias"])

        def rec_of_kernel(k):
            out = jax.lax.conv_general_dilated(
                h_sg, k, window_strides=(1, 1), padding="SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return out + bias_sg

        def nll_of_kernel(k):
            rec2 = rec_of_kernel(k)
            nll, _, _ = loss.nll_and_kl(lp, batch_x, rec2, post_sg)
            logits_fake = loss.discriminator.apply(
                {"params": lp["discriminator"]}, rec2
            )
            return nll, -jnp.mean(logits_fake)

        k0 = conv["kernel"]
        nll_g = jax.grad(lambda k: nll_of_kernel(k)[0])(k0)
        gan_g = jax.grad(lambda k: nll_of_kernel(k)[1])(k0)
        total, log = loss.generator_loss(
            lp, batch_x, rec, posterior, step, last_layer_grads=(nll_g, gan_g)
        )
        return total, (log, rec)

    def d_loss_fn(dp, lp, batch_x, rec, step):
        lp2 = {**lp, "discriminator": dp}
        return loss.discriminator_loss(lp2, batch_x, rec, step)

    # donate the four state trees: without donation the input and output
    # params/optimizer coexist across the step boundary (the same ~2G that
    # pushed the 512 GAN step over one chip's HBM)
    from functools import partial

    @partial(jax.jit, donate_argnums=(0, 1, 2, 3))
    def train_step(vp, lp, og, od, batch_x, key, step):
        (gl, (log, rec)), grads = jax.value_and_grad(g_loss_fn, has_aux=True)(
            vp, lp, batch_x, key, step
        )
        upd, og = tx_g.update(grads, og, vp)
        vp = optax.apply_updates(vp, upd)

        (dl, dlog), dgrads = jax.value_and_grad(d_loss_fn, has_aux=True)(
            lp["discriminator"], lp, batch_x, rec, step
        )
        dupd, od = tx_d.update(dgrads, od, lp["discriminator"])
        lp = {**lp, "discriminator": optax.apply_updates(lp["discriminator"], dupd)}
        return vp, lp, og, od, {**log, **dlog}

    ds = instantiate_from_config(cfg["data"]["params"]["train"])
    loader = PrefetchLoader(ds, bs, num_threads=args.num_workers, seed=args.seed)

    now = datetime.now().strftime("%Y-%m-%dT%H-%M-%S")
    logdir = os.path.join(args.logdir, f"{now}_range_autoencoder")
    mgr = CheckpointManager(os.path.join(logdir, "checkpoints"))
    metrics_path = os.path.join(logdir, "metrics.jsonl")
    os.makedirs(logdir, exist_ok=True)

    step = 0
    max_steps = args.max_steps or 10**12
    while step < max_steps:
        for batch in loader:
            x = jnp.asarray(batch["lidar"]["range_data"])
            rng, sub = jax.random.split(rng)
            vae_params, loss_params, opt_g, opt_d, log = train_step(
                vae_params, loss_params, opt_g, opt_d, x, sub,
                jnp.asarray(step),
            )
            step += 1
            if step % args.log_every == 0:
                rec = {k: float(v) for k, v in log.items()}
                rec["step"] = step
                with open(metrics_path, "a") as f:
                    f.write(json.dumps(rec) + "\n")
                print(f"step {step} total {rec.get('train/total_loss'):.4f} "
                      f"rec {rec.get('train/rec_loss'):.4f}")
            if step % args.save_every == 0:
                mgr.save(step, {"vae": jax.device_get(vae_params),
                                "loss": jax.device_get(loss_params)})
            if step >= max_steps:
                break
    mgr.save(step, {"vae": jax.device_get(vae_params),
                    "loss": jax.device_get(loss_params)})
    mgr.wait()
    print(f"done; checkpoints in {logdir}")


if __name__ == "__main__":
    main()
