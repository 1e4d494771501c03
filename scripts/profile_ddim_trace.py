#!/usr/bin/env python
"""Capture a REAL device profile of the DDIM sampling step.

PROFILE.md's MFU number comes from `compiled.cost_analysis()` — a model,
not a measurement. This script wraps steady-state sampling segments (the
exact bench.py configuration: flagship 512 config, bf16 residency, batch
MOBI_BENCH_BATCH_PAIRS, segmented DDIM) in `jax.profiler.trace`, then
parses the captured .xplane.pb with tensorboard-plugin-profile into a
per-HLO-op self-time table, so the claimed attention share and the
non-attention residue can be checked against measured device time.

If the tunneled runtime cannot produce device traces (host-only xplane),
the script says so explicitly — that outcome is documented in PROFILE.md
rather than silently reporting host time as device time.

  MOBI_BENCH_BATCH_PAIRS=20 /opt/venv/bin/python \
      scripts/profile_ddim_trace.py --outdir logs/ddim_trace [--top 25]
"""
from __future__ import annotations

import argparse
import glob
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_xplane(trace_dir: str, top: int):
    """Parse the capture's Chrome-trace JSON (…trace.json.gz — written next
    to the .xplane.pb; this environment's tensorboard_plugin_profile build
    ships no xplane_pb2) into per-op SELF time on the device 'XLA Ops'
    line. 'X' events on one tid nest (fusions contain sub-ops), so raw
    duration sums double-count — self time is computed with an interval
    stack per tid. Returns (ranked rows, total_device_us, planes_seen)."""
    import gzip
    import json as _json

    paths = sorted(glob.glob(
        os.path.join(trace_dir, "plugins/profile/*/*.trace.json.gz")
    ))
    if not paths:
        return None, 0.0, []
    with gzip.open(paths[-1]) as f:
        events = _json.load(f)["traceEvents"]

    planes, device_pids, tid_names = {}, set(), {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            name = e["args"]["name"]
            planes[e["pid"]] = name
            if "TPU" in name or "device" in name.lower():
                device_pids.add(e["pid"])
        elif e.get("ph") == "M" and e.get("name") == "thread_name":
            tid_names[(e["pid"], e["tid"])] = e["args"]["name"]

    # group complete events per (pid, tid); compute self time via nesting.
    # Keep only op lines ('XLA Ops') — the 'XLA Modules' line spans whole
    # executables and would double-count every op under it.
    by_line = {}
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in device_pids:
            lname = tid_names.get((e["pid"], e.get("tid")), "")
            if "Module" in lname:
                continue
            by_line.setdefault((e["pid"], e.get("tid")), []).append(e)

    rows, total = {}, 0.0
    for line_events in by_line.values():
        line_events.sort(key=lambda e: (e["ts"], -e.get("dur", 0)))
        stack = []  # (end_ts, child_time_accum index into frames)
        frames = []
        for e in line_events:
            ts, dur = e["ts"], e.get("dur", 0)
            while stack and ts >= stack[-1][0]:
                end, idx = stack.pop()
                name, d, child = frames[idx]
                self_us = max(d - child, 0.0)
                rows[name] = rows.get(name, 0.0) + self_us
                total += self_us
                if stack:
                    frames[stack[-1][1]][2] += d
            frames.append([e.get("name", "?"), float(dur), 0.0])
            stack.append((ts + dur, len(frames) - 1))
        while stack:
            end, idx = stack.pop()
            name, d, child = frames[idx]
            self_us = max(d - child, 0.0)
            rows[name] = rows.get(name, 0.0) + self_us
            total += self_us
            if stack:
                frames[stack[-1][1]][2] += d

    ranked = sorted(rows.items(), key=lambda kv: -kv[1])[:top]
    return ranked, total, list(planes.values())


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--outdir", default="logs/ddim_trace")
    p.add_argument("--top", type=int, default=25)
    p.add_argument("--segments-to-trace", type=int, default=3)
    p.add_argument("--parse-only", action="store_true",
                   help="re-parse an existing capture in --outdir")
    opt = p.parse_args(argv)

    if opt.parse_only:
        _report(opt)
        return

    import jax

    import bench  # reuse the exact bench configuration

    def log(m):
        print(f"# {time.strftime('%H:%M:%S')} {m}", file=sys.stderr,
              flush=True)

    log("building model + params (bench configuration)")
    model, params = bench.build()
    batch = bench.make_batch(bench.BATCH_PAIRS)
    import jax.numpy as jnp

    params = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16)
        if (hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2)
        else x,
        params,
    )
    dev = jax.devices()[0]
    params = jax.device_put(params, dev)
    batch = jax.device_put(batch, dev)
    jax.block_until_ready(params)
    log(f"params resident on {dev}")

    from mobi_tpu.pipeline import make_inpaint_pipeline

    segments = int(os.environ.get("MOBI_BENCH_SEGMENTS", "5"))
    pipe = make_inpaint_pipeline(
        model, num_steps=bench.STEPS, guidance_scale=bench.GUIDANCE,
        sampler="ddim", sample_segments=segments,
    )
    log("warmup (compile)")
    out = pipe(params, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(out)

    # Trace: prep + the first N sampling segments, executed exactly like
    # the bench's steady state (compiled executables, async dispatch).
    log(f"tracing prep + {opt.segments_to_trace} sampling segments")
    os.makedirs(opt.outdir, exist_ok=True)
    slices = pipe._place_slices()
    with jax.profiler.trace(opt.outdir):
        x, carry2, rest, cond, uncond, zf = pipe._prep(
            params, batch, jax.random.PRNGKey(2)
        )
        for sl in slices[: opt.segments_to_trace]:
            x, carry2 = pipe._seg(
                params, x, carry2, rest, cond, uncond, sl
            )
        jax.block_until_ready(x)
    log("trace captured; parsing")
    _report(opt)


def _report(opt):
    ranked, total_us, planes = parse_xplane(opt.outdir, opt.top)
    report = {"planes": planes,
              "batch_pairs": int(os.environ.get(
                  "MOBI_BENCH_BATCH_PAIRS", "20")),
              "segments_traced": opt.segments_to_trace}
    if ranked is None:
        report["device_trace"] = "NO TRACE CAPTURED"
    elif total_us == 0.0:
        report["device_trace"] = (
            "host-only capture: no device plane events (the tunneled "
            "runtime does not export TPU device traces)"
        )
    else:
        report["total_device_ms"] = round(total_us / 1e3, 2)
        report["top_ops"] = [
            {"op": name, "self_ms": round(us / 1e3, 3),
             "pct": round(100.0 * us / total_us, 2)}
            for name, us in ranked
        ]
    out_path = os.path.join(opt.outdir, "ddim_trace_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "top_ops"}))
    for row in report.get("top_ops", [])[:25]:
        print(f"{row['pct']:6.2f}%  {row['self_ms']:10.3f} ms  {row['op']}")


if __name__ == "__main__":
    main()
