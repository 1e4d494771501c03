"""Compile-only HBM plan probe for the flagship inpaint pipeline.

Asks XLA (`compiled.memory_analysis()`) for the exact HBM plan of the
bench.py program at candidate (batch_pairs, vae_chunk_pairs) settings WITHOUT
dispatching anything — abstract ShapeDtypeStruct operands, so no parameter
materialization or transfer. This is how the "batch_pairs >= 22 device
fault" was root-caused as HBM OOM (PROFILE.md) and how chunked-VAE batch
candidates are vetted before burning a device run.

  /opt/venv/bin/python scripts/hbm_probe.py --pairs 20 24 28 32 --chunks 0 4
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

GB = 1024**3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, nargs="+", default=[20, 24, 28, 32])
    ap.add_argument("--chunks", type=int, nargs="+", default=[0, 4],
                    help="vae_chunk_pairs settings (0 = unchunked)")
    ap.add_argument("--budget-gb", type=float, default=15.75)
    args = ap.parse_args()

    import bench
    from mobi_tpu.pipeline import make_inpaint_pipeline

    model, params = bench.build()
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if (hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2)
        else x,
        params,
    )
    p_abs = jax.tree.map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), params
    )
    key_abs = jax.ShapeDtypeStruct((2,), jnp.uint32)

    print("| pairs | chunk | args GB | temps GB | out GB | code GB | total "
          "GB | fits {:.2f} GB |".format(args.budget_gb))
    print("|---|---|---|---|---|---|---|---|")
    for pairs in args.pairs:
        b_abs = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
            bench.make_batch(pairs),
        )
        for chunk in args.chunks:
            if chunk and pairs % chunk:
                continue
            fn = make_inpaint_pipeline(
                model, num_steps=bench.STEPS, guidance_scale=bench.GUIDANCE,
                sampler="ddim", vae_chunk_pairs=chunk,
            )
            try:
                ma = fn.lower(p_abs, b_abs, key_abs).compile().memory_analysis()
            except Exception as e:  # compile service hiccup: record, move on
                print(f"| {pairs} | {chunk} | compile failed: "
                      f"{type(e).__name__}: {str(e)[:80]} |")
                continue
            a, t = ma.argument_size_in_bytes, ma.temp_size_in_bytes
            o, c = ma.output_size_in_bytes, ma.generated_code_size_in_bytes
            total = a + t + o + c - ma.alias_size_in_bytes
            print(f"| {pairs} | {chunk} | {a / GB:.2f} | {t / GB:.2f} "
                  f"| {o / GB:.2f} | {c / GB:.2f} | {total / GB:.2f} "
                  f"| {'YES' if total <= args.budget_gb * GB else 'no'} |",
                  flush=True)


if __name__ == "__main__":
    main()
