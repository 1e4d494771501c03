#!/usr/bin/env python
"""Per-stage wall time + achieved TFLOP/s of the flagship inpaint pipeline.

SegmentedInpaint (mobi_tpu/pipeline.py) splits the pipeline into prep
(cond encode + 4x VAE enc), K sampling segments (the CFG DDIM scan), and
decode (2x VAE dec) — three separately dispatchable compiled programs, so
the stage breakdown is directly measurable instead of estimated from
batch-4 deltas (PROFILE.md r2). Pairs each stage's wall time with its own
`cost_analysis()` FLOPs for a per-stage MFU.

Tunneled-runtime pitfalls handled (PROFILE.md "Measurement pitfall"):
every timed iteration varies an operand and fetches a scalar from the
result — identical dispatches may be elided and block_until_ready may
return early on this runtime.

Usage: /opt/venv/bin/python scripts/stage_timing.py
       [--pairs 20] [--segments 5] [--iters 4]
"""
from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_PEAK = 197e12


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pairs", type=int, default=20)
    ap.add_argument("--segments", type=int, default=5)
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from bench import build, make_batch
    from mobi_tpu.pipeline import make_inpaint_pipeline

    def log(m):
        print(f"# {time.strftime('%H:%M:%S')} {m}", file=sys.stderr, flush=True)

    log("building model + params")
    model, params = build()
    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if (hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2)
        else x,
        params,
    )
    batch = make_batch(args.pairs)
    dev = jax.devices()[0]
    log(f"transferring to {dev.platform}")
    params = jax.device_put(params, dev)
    batch = jax.device_put(batch, dev)
    jax.block_until_ready(params)

    si = make_inpaint_pipeline(
        model, num_steps=args.steps, guidance_scale=5.0, sampler="ddim",
        sample_segments=args.segments,
    )
    rng = jax.random.PRNGKey(1)
    log("AOT compiling prep/segment/decode (preflight)")
    si.preflight(params, batch, rng, label="stage_timing")
    prep_c, seg_c, dec_c = si._prep_c, si._seg_c, si._dec_c
    slices = si._place_slices()

    def fetch(tree):
        leaf = jax.tree.leaves(tree)[0]
        return float(np.asarray(leaf).ravel()[0])

    def timed(label, fn, n=args.iters):
        ts = []
        for i in range(n):
            t0 = time.perf_counter()
            out = fn(i)
            fetch(out)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        log(f"{label}: {['%.2f' % t for t in ts]} -> {best:.3f}s best")
        return best

    def flops(compiled):
        ca = compiled.cost_analysis()
        if isinstance(ca, list):  # older jax returns [dict]
            ca = ca[0]
        return float(ca.get("flops", 0.0))

    # warm each program once (compile already done; first dispatch pays
    # any lazy transfer of the step tables)
    x, key, rest, cond, uncond, zf = prep_c(params, batch, rng)
    seg_out = seg_c(params, x, key, rest, cond, uncond, slices[0])
    fetch(dec_c(params, seg_out[0], zf))

    t_prep = timed(
        "prep (cond encode + 4x VAE enc)",
        lambda i: prep_c(params, batch, jax.random.PRNGKey(100 + i)),
    )
    t_seg = timed(
        f"sampling segment ({args.steps // args.segments} CFG DDIM steps)",
        lambda i: seg_c(
            params, x, jax.random.PRNGKey(200 + i), rest, cond, uncond,
            slices[0],
        ),
    )
    t_dec = timed(
        "decode (2x VAE dec)",
        lambda i: dec_c(params, x * (1.0 + 1e-6 * i), zf),
    )

    # HLO cost analysis counts a while/scan body ONCE (same quirk
    # scripts/mfu_analysis.py corrects for): a segment program's reported
    # flops are one step's worth — multiply by its trip count.
    trip = args.steps // args.segments
    f_prep, f_seg, f_dec = flops(prep_c), flops(seg_c) * trip, flops(dec_c)
    total = t_prep + args.segments * t_seg + t_dec
    rows = [
        ("prep (cond encode + 4x VAE enc)", t_prep, f_prep, 1),
        (f"segment ({trip} steps)", t_seg, f_seg, args.segments),
        ("decode (2x VAE dec)", t_dec, f_dec, 1),
    ]
    print(f"\nper-stage timing, batch of {args.pairs} pairs "
          f"(best of {args.iters}):\n")
    print("| stage | s/call | calls | s total | share | TFLOPs/call | "
          "TFLOP/s | % bf16 peak |")
    print("|---|---|---|---|---|---|---|---|")
    for name, t, f, calls in rows:
        tf = f / t / 1e12
        print(f"| {name} | {t:.3f} | {calls} | {calls * t:.2f} | "
              f"{100 * calls * t / total:.1f}% | {f / 1e12:.2f} | {tf:.1f} | "
              f"{100 * tf * 1e12 / V5E_BF16_PEAK:.1f}% |")
    ftot = f_prep + args.segments * f_seg + f_dec
    print(f"| total | | | {total:.2f} | 100% | {ftot / 1e12:.1f} | "
          f"{ftot / total / 1e12:.1f} | "
          f"{100 * ftot / total / V5E_BF16_PEAK:.1f}% |")
    print(
        f'\n{{"pairs": {args.pairs}, "t_prep": {t_prep:.3f}, '
        f'"t_seg": {t_seg:.3f}, "t_dec": {t_dec:.3f}, '
        f'"total": {total:.2f}}}'
    )


if __name__ == "__main__":
    main()
