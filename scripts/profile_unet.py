#!/usr/bin/env python
"""Whole-UNet A/B profiler on the real TPU: attention backend + attention
share of the flagship forward pass.

Per PROFILE.md, per-op microbenchmarks through the tunneled runtime are
noise-dominated; whole-UNet A/B with a host fetch per iteration is the
reliable methodology. Variants:

  flash  — attn_backend="auto" (Pallas flash at >=1024 tokens)
  xla    — attn_backend="xla"  (fused XLA attention everywhere)
  noattn — attention_resolutions=() (transformer blocks removed): the
           difference vs the above isolates the attention+transformer share.

Usage: python scripts/profile_unet.py [--batch 16] [--iters 20]
       [--variants flash,xla,noattn]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16,
                    help="effective UNet batch (bench: 4 pairs x2 modal x2 CFG)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--variants", default="flash,xla,noattn")
    ap.add_argument("--param-dtype", default="bf16", choices=["bf16", "f32"])
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from mobi_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    from mobi_tpu.models.unet import UNetModel

    def build(attn_backend="auto", attention_resolutions=(4, 2, 1)):
        return UNetModel(
            in_channels=9, model_channels=320, out_channels=4,
            num_res_blocks=2, attention_resolutions=attention_resolutions,
            channel_mult=(1, 2, 4, 4), num_heads=8, context_dim=768,
            bbox_cond=True, use_camera=True, use_lidar=True,
            attn_backend=attn_backend, dtype=jnp.bfloat16,
        )

    b = args.batch
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(b, 64, 64, 9)).astype(np.float32))
    t = jnp.asarray(rng.integers(0, 1000, (b,)).astype(np.int32))
    ctx = jnp.asarray(rng.normal(size=(b, 2, 768)).astype(np.float32))

    print("init params (CPU)", flush=True)
    t0 = time.perf_counter()
    # init with an fp32 clone: bf16 execution is software-emulated on CPU
    base = build().clone(dtype=jnp.float32)

    def _init(key):
        with jax.default_device(jax.devices("cpu")[0]):
            return base.init(key, x[:2], t[:2], ctx[:2])

    from mobi_tpu.utils.param_cache import cached_init

    params = cached_init(
        _init, jax.random.PRNGKey(0), "profile_unet:" + repr(base)
    )
    if args.param_dtype == "bf16":
        params = jax.tree.map(
            lambda p: p.astype(jnp.bfloat16)
            if p.dtype == jnp.float32 else p, params
        )
    print(f"init done in {time.perf_counter()-t0:.0f}s; transferring",
          flush=True)
    dev = jax.devices()[0]
    t0 = time.perf_counter()
    params = jax.device_put(params, dev)
    x, t, ctx = jax.device_put((x, t, ctx), dev)
    jax.block_until_ready(params)
    print(f"transfer done in {time.perf_counter()-t0:.0f}s", flush=True)

    results = {}
    for variant in args.variants.split(","):
        # "flash@exp2" / "flash@noexp-timing" select the flash kernel's
        # softmax-exponential variant (ops/flash_attention._EXP_MODE) for
        # the ceiling-decomposition A/B; the flag is read at trace time so
        # it can be flipped between freshly-jitted variants in one process
        import mobi_tpu.ops.flash_attention as fa

        fa._EXP_MODE = "exp"
        name = variant
        if variant.startswith("flash@"):
            fa._EXP_MODE = variant.split("@", 1)[1]
            variant = "flash"
        if variant == "flash":
            model = build("auto")
        elif variant == "xla":
            model = build("xla")
        elif variant == "noattn":
            model = build("auto", attention_resolutions=())
        else:
            raise SystemExit(f"unknown variant {variant}")
        variant = name

        fwd = jax.jit(lambda p, x, t, c, m=model: m.apply(p, x, t, c))
        print(f"[{variant}] compiling...", flush=True)
        t0 = time.perf_counter()
        out = fwd(params, x, t, ctx)
        _ = float(jnp.asarray(out).reshape(-1)[0])
        print(f"[{variant}] compile+first {time.perf_counter()-t0:.0f}s",
              flush=True)

        t0 = time.perf_counter()
        for _ in range(args.iters):
            out = fwd(params, x, t, ctx)
            _ = float(jnp.asarray(out).reshape(-1)[0])  # force host fetch
        dt = (time.perf_counter() - t0) / args.iters * 1e3
        results[variant] = dt
        print(f"[{variant}] {dt:.1f} ms/fwd @ batch {b}", flush=True)

    print("\nsummary:", {k: f"{v:.1f} ms" for k, v in results.items()})
    if "noattn" in results:
        for k in ("flash", "xla"):
            if k in results:
                share = 1 - results["noattn"] / results[k]
                print(f"attention share ({k}): {share*100:.0f}%")


if __name__ == "__main__":
    main()
