"""Instrumented FLOP count + MFU for the flagship inpainting pipeline.

Replaces PROFILE.md's estimated "~700 TFLOPs per batch -> ~30% MFU" with
numbers from XLA's own cost model (`compiled.cost_analysis()`), per stage:

  total/batch = flops(get_input) + STEPS * flops(cfg_step) + flops(decode)

The 50-step DDIM scan must be costed per-step and multiplied: HLO cost
analysis counts a while/scan body ONCE regardless of trip count, so costing
the whole jitted pipeline under-reports by ~49 UNet calls. `cfg_step` is the
exact per-iteration device work of samplers.ddim_sample's scan body: the
CFG-doubled apply_model (batch 4*pairs: modality interleave x uncond/cond)
plus the guided-eps and DDIM update math.

Usage (one jax process at a time on this machine):
  /opt/venv/bin/python scripts/mfu_analysis.py [--seconds-per-batch S]

--seconds-per-batch: measured steady-state from bench.py at the same
MOBI_BENCH_BATCH_PAIRS (PROFILE.md batch-scaling table). Peak for MFU is
the v5e's 197 bf16 TFLOP/s.
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

V5E_PEAK_FLOPS = 197e12  # bf16 per chip


def _cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0]
    try:
        ma = compiled.memory_analysis()
        temp = float(ma.temp_size_in_bytes)
    except Exception:
        temp = float("nan")
    return (float(ca.get("flops", 0.0)), float(ca.get("bytes accessed", 0.0)),
            temp)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seconds-per-batch", type=float, default=None,
                    help="measured bench.py steady state at this batch size; "
                         "omit to print FLOPs only")
    args = ap.parse_args()

    import bench
    from mobi_tpu.models.samplers import _ddim_update, _guided_eps
    from mobi_tpu.ops.schedules import SamplerTables

    pairs = bench.BATCH_PAIRS
    steps = bench.STEPS
    model, params = bench.build()
    if os.environ.get("MOBI_BENCH_BF16_PARAMS", "1") == "1":
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if (hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2)
            else x,
            params,
        )
    dev = jax.devices()[0]
    print(f"# costing on {dev.platform}, batch_pairs={pairs}", file=sys.stderr)
    params = jax.device_put(params, dev)
    batch = jax.device_put(bench.make_batch(pairs), dev)
    key = jax.random.PRNGKey(0)

    # ---- stage 1: conditioning + VAE encodes -------------------------------
    gi = jax.jit(lambda p, b, k: model.get_input(p, b, k, encode_cond=True))
    gi_c = gi.lower(params, batch, key).compile()
    f_gi, b_gi, m_gi = _cost(gi_c)
    data = jax.block_until_ready(gi(params, batch, key))  # concrete shapes

    # ---- stage 2: one CFG-doubled denoising step ---------------------------
    # mirrors samplers.ddim_sample's scan body (samplers.py:105-115 via
    # batched/guided): 2x-batched UNet eval + guided eps + DDIM update
    z = data["z"]
    rest = z[..., 4:]
    cond = data["cond"]
    uncond = model.uncond_tokens(params, z.shape[0])
    tables = SamplerTables.create(model.schedule, steps)
    x = jax.random.normal(key, z[..., :4].shape, dtype=jnp.float32)
    guidance = bench.GUIDANCE

    def cfg_step(params, x, rest, cond, uncond):
        # exact mirror of samplers.py:105-113 at eta=0 (zero noise)
        x9 = jnp.concatenate([x, rest], axis=-1)
        tb = jnp.full((x.shape[0],), 500, jnp.int32)

        def model_fn(a, b, c):
            return model.apply_model(params, a, b, c)

        eps = _guided_eps(model_fn, x9, tb, cond, uncond, guidance)
        out, _ = _ddim_update(
            x, eps, tables.alphas[0], tables.alphas_prev[0],
            tables.sqrt_one_minus_alphas[0], tables.sigmas[0],
            jnp.zeros_like(x),
        )
        return out

    st = jax.jit(cfg_step)
    st_c = st.lower(params, x, rest, cond, uncond).compile()
    f_st, b_st, m_st = _cost(st_c)

    # ---- stage 3: VAE decodes ----------------------------------------------
    # lidar_geom is static Python ints when get_input is traced inline (the
    # real pipeline); the standalone gi jit returns it as arrays — rehost.
    geom = data.get("lidar_geom")
    if geom is not None:
        geom = {k: int(v) for k, v in geom.items()}
    dec = jax.jit(
        lambda p, s, zf: model.decode_sample(p, s, zf, geom)
    )
    dec_c = dec.lower(params, x, data.get("z_lidar_full")).compile()
    f_dec, b_dec, m_dec = _cost(dec_c)

    total = f_gi + steps * f_st + f_dec
    rows = [
        ("get_input (cond encode + 4x VAE enc)", f_gi, b_gi, m_gi, 1),
        (f"CFG DDIM step (UNet eff-batch {4 * pairs})", f_st, b_st, m_st,
         steps),
        ("decode (2x VAE dec)", f_dec, b_dec, m_dec, 1),
    ]
    print(f"\nXLA cost_analysis, batch of {pairs} (camera,lidar) pairs:\n")
    print("| stage | TFLOPs/call | GB accessed/call | HBM temp GB | calls "
          "| TFLOPs total |")
    print("|---|---|---|---|---|---|")
    for name, f, bts, m, n in rows:
        print(f"| {name} | {f / 1e12:.2f} | {bts / 1e9:.1f} | {m / 1e9:.2f} "
              f"| {n} | {n * f / 1e12:.2f} |")
    print(f"| **pipeline total** | | | | **{total / 1e12:.2f}** |")

    rec = {
        "batch_pairs": pairs,
        "tflops_per_batch": round(total / 1e12, 2),
        "tflops_get_input": round(f_gi / 1e12, 2),
        "tflops_per_cfg_step": round(f_st / 1e12, 3),
        "tflops_decode": round(f_dec / 1e12, 2),
    }
    if args.seconds_per_batch:
        ach = total / args.seconds_per_batch
        rec["seconds_per_batch"] = args.seconds_per_batch
        rec["achieved_tflops_per_s"] = round(ach / 1e12, 1)
        rec["mfu_vs_v5e_197tf_bf16"] = round(ach / V5E_PEAK_FLOPS, 3)
        print(f"\nachieved: {ach / 1e12:.1f} TFLOP/s over "
              f"{args.seconds_per_batch:.2f}s/batch -> "
              f"MFU {ach / V5E_PEAK_FLOPS:.1%} of 197 bf16 TFLOP/s")
    print(json.dumps(rec))


if __name__ == "__main__":
    main()
