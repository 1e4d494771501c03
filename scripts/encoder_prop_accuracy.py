"""Quantify the encoder-propagation sampling mode's accuracy cost.

`MobiDiffusion.sample(encoder_interval=k)` (samplers.ddim_sample, "Faster
Diffusion" arXiv 2312.09608) reuses cached UNet encoder/middle activations
for k-1 of every k DDIM steps. It is opt-in and approximate; this script
measures HOW approximate, per interval, against the exact DDIM-50 run from
the same noise/batch/params:

  * latent relative MSE: ||z_k - z_1||^2 / ||z_1||^2 over the final latents;
  * decoded-pixel PSNR (camera + lidar range channels) of the k-interval
    decode vs the exact decode;
  * LPIPS (AlexNet, fabricated weights via scripts/fabricate_eval_weights.py
    when MOBI_EVAL_WEIGHTS is set) between the two decoded camera sets.

Caveat recorded in PROFILE.md: with random (cached-init) weights this
quantifies the numerical divergence of the computation, not perceptual
quality on trained checkpoints — it is the strongest oracle available on a
machine with no published weights. A CPU regression test pins the tiny-config
interval-2 divergence band (tests/test_encoder_propagation.py).

  MOBI_BENCH_BATCH_PAIRS=8 /opt/venv/bin/python scripts/encoder_prop_accuracy.py
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

INTERVALS = (1, 2, 3, 5)


def psnr(a: np.ndarray, b: np.ndarray, peak: float = 2.0) -> float:
    mse = float(np.mean((a.astype(np.float64) - b.astype(np.float64)) ** 2))
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10(peak**2 / mse))


def perturb_zero_init(params, scale=0.02, seed=0):
    """The UNet's zero_module convs (ResBlock/transformer out projections and
    the final out_conv) make eps_pred EXACTLY zero at init, so a random-init
    sweep would measure nothing: the DDIM trajectory becomes model-independent
    and every interval returns bitwise-equal latents (observed: rel_mse 0.0
    for 2/3/5 with only a ~61.7 dB bf16 recompilation noise floor in the
    decode). Same knob as train.py's MOBI_RANDOMIZE_ZERO_INIT: bump all-zero
    >=2-D leaves off the zero point, deterministically."""
    rng = np.random.default_rng(seed)

    def bump(x):
        if hasattr(x, "ndim") and x.ndim >= 2 and not np.any(np.asarray(x)):
            return (scale * rng.standard_normal(x.shape)).astype(x.dtype)
        return x

    return jax.tree.map(bump, params)


def main():
    import bench

    pairs = bench.BATCH_PAIRS
    steps = bench.STEPS
    model, params = bench.build()
    params = perturb_zero_init(params)
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if (hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2)
        else x,
        params,
    )
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    batch = jax.device_put(bench.make_batch(pairs), dev)
    key = jax.random.PRNGKey(7)

    def log(m):
        print(f"# {time.strftime('%H:%M:%S')} {m}", file=sys.stderr, flush=True)

    def run(interval):
        @jax.jit
        def fn(params, batch, rng):
            k1, k2 = jax.random.split(rng)
            data = model.get_input(params, batch, k1, encode_cond=True)
            lat = model.sample(
                params, data, k2, num_steps=steps,
                guidance_scale=bench.GUIDANCE, sampler="ddim",
                encoder_interval=interval,
            )
            dec = model.decode_sample(
                params, lat, data.get("z_lidar_full"), data.get("lidar_geom")
            )
            return lat, dec

        t0 = time.perf_counter()
        lat, dec = fn(params, batch, key)
        lat = np.asarray(lat, np.float32)
        dec = {k: np.asarray(v, np.float32) for k, v in dec.items()}
        log(f"interval={interval} done in {time.perf_counter() - t0:.1f}s "
            "(incl compile)")
        return lat, dec

    ref_lat, ref_dec = run(1)

    lpips_fn = None
    w = os.environ.get("MOBI_EVAL_WEIGHTS")
    if w and os.path.exists(os.path.join(w, "lpips_alex.pth")):
        from mobi_tpu.checkpoint import load_torch_checkpoint
        from mobi_tpu.eval.lpips import LPIPS, import_lpips_weights

        lp_params = jax.device_put(import_lpips_weights(
            load_torch_checkpoint(os.path.join(w, "lpips_alex.pth")),
            load_torch_checkpoint(os.path.join(w, "alexnet.pth")),
        ))
        lp = LPIPS()
        _lp_apply = jax.jit(lambda p, a, b: lp.apply(p, a, b).mean())

        def lpips_fn(a, b):
            return _lp_apply(lp_params, a, b)

        log("LPIPS enabled (fabricated alex weights)")

    rows = []
    for k in INTERVALS[1:]:
        lat, dec = run(k)
        rel = float(
            np.sum((lat - ref_lat) ** 2) / max(np.sum(ref_lat**2), 1e-12)
        )
        row = {"interval": k, "latent_rel_mse": float(f"{rel:.3e}")}
        for mod in ("camera", "lidar"):
            if mod in dec:
                row[f"psnr_{mod}"] = round(psnr(dec[mod], ref_dec[mod]), 2)
        if lpips_fn is not None and "camera" in dec:
            # LPIPS expects [-1,1] NHWC at 256; decoded is 512 — downsample 2x
            a = jnp.asarray(dec["camera"][:, ::2, ::2, :])
            b = jnp.asarray(ref_dec["camera"][:, ::2, ::2, :])
            row["lpips_camera"] = round(float(lpips_fn(a, b)), 5)
        rows.append(row)
        log(str(row))

    print(json.dumps({"batch_pairs": pairs, "steps": steps, "rows": rows}))


if __name__ == "__main__":
    main()
