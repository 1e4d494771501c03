#!/usr/bin/env python
"""Capture a REAL device profile of the DDIM sampling step, with op
attribution.

PROFILE.md's MFU number comes from `compiled.cost_analysis()` — a model,
not a measurement. This script wraps steady-state sampling segments (the
exact bench.py configuration: flagship 512 config, bf16 residency, batch
MOBI_BENCH_BATCH_PAIRS, segmented DDIM) in `jax.profiler.trace`, parses the
captured Chrome-trace JSON into a per-HLO-op self-time table, and RESOLVES
each op name against the compiled executables' optimized-HLO metadata
(`metadata={op_name="jit(seg)/.../input_blocks_4_attn/..."}`) so fusion
names like `branch_0_fun.261` map back to the flax module scopes they were
fused from. The resolved scopes are then aggregated into categories
(self/cross/cross-modal attention matmuls, conv, groupnorm, ...) — the
measured answer to "where does device time go".

If the tunneled runtime cannot produce device traces (host-only xplane),
the script says so explicitly — that outcome is documented in PROFILE.md
rather than silently reporting host time as device time.

  MOBI_BENCH_BATCH_PAIRS=20 /opt/venv/bin/python \
      scripts/profile_ddim_trace.py --outdir logs/ddim_trace [--top 25]
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import re
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


# --------------------------------------------------------- HLO attribution
_METADATA_RE = re.compile(
    r"^\s*(?:ROOT\s+)?%?([\w.\-]+)\s*=\s.*metadata=\{[^}]*?"
    r"op_name=\"([^\"]+)\"", re.M,
)


def load_hlo_op_map(trace_dir: str):
    """instruction name -> op_name metadata (the jax name-stack path, which
    carries the flax module scopes) from the hlo_*.txt.gz dumps written at
    capture time."""
    op_map = {}
    for path in sorted(glob.glob(os.path.join(trace_dir, "hlo_*.txt.gz"))):
        with gzip.open(path, "rt") as f:
            text = f.read()
        for name, op_name in _METADATA_RE.findall(text):
            op_map[name] = op_name
    return op_map


def categorize(scope: str) -> str:
    """Flax-scope path -> a coarse where-does-time-go category."""
    s = scope.lower()
    if "flash" in s or "pallas" in s:
        return "attention:flash-kernel"
    if "cross_modal_attn" in s:
        return "attention:cross-modal"
    if "cond_adapter_attn" in s:
        return "attention:bbox-adapter"
    if "/attn1/" in s:
        return "attention:self"
    if "/attn2/" in s:
        return "attention:clip-cross"
    if "/ff/" in s:
        return "transformer:geglu-ff"
    if "proj_in" in s or "proj_out" in s:
        return "transformer:proj"
    if "norm" in s and ("group" in s or "_norm" in s or "/norm" in s):
        return "norm"
    if "conv" in s or "down" in s or "up" in s or "skip_connection" in s:
        return "conv"
    if "emb" in s or "time_embed" in s:
        return "timestep-emb"
    if "vae" in s or "encoder" in s or "decoder" in s:
        return "vae"
    return "other"


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
    log("AOT compile (preflight) + optimized-HLO dump for op attribution")
    os.makedirs(opt.outdir, exist_ok=True)
    pipe.preflight(params, batch, jax.random.PRNGKey(1))
    for name, compiled in (
        [("prep", pipe._prep_c)]
        + [(f"seg{n}", c) for n, c in sorted(pipe._seg_c.items())]
        + [("dec", pipe._dec_c)]
    ):
        if compiled is None:
            continue
        try:
            text = compiled.as_text()
        except Exception as e:  # runtime without HLO text access
            log(f"no HLO text for {name}: {e}")
            continue
        with gzip.open(
            os.path.join(opt.outdir, f"hlo_{name}.txt.gz"), "wt"
        ) as f:
            f.write(text)
    log("warmup run")
    out = pipe(params, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(out)

    # capture metadata: the parse step re-reads these instead of
    # re-deriving defaults that could drift from bench.py's
    with open(os.path.join(opt.outdir, "capture_meta.json"), "w") as f:
        json.dump({
            "batch_pairs": bench.BATCH_PAIRS,
            "segments": segments,
            "steps": bench.STEPS,
            "segments_to_trace": opt.segments_to_trace,
        }, f)

    # Trace: prep + the first N sampling segments, executed exactly like
    # the bench's steady state (compiled executables, async dispatch).
    log(f"tracing prep + {opt.segments_to_trace} sampling segments")
    slices = pipe._place_slices()
    with jax.profiler.trace(opt.outdir):
        x, carry2, rest, cond, uncond, zf = pipe._prep_c(
            params, batch, jax.random.PRNGKey(2)
        )
        for sl in slices[: opt.segments_to_trace]:
            n = int(sl[0].shape[0])
            x, carry2 = pipe._seg_c[n](
                params, x, carry2, rest, cond, uncond, sl
            )
        jax.block_until_ready(x)
    log("trace captured; parsing")
    _report(opt)


def _report(opt):
    ranked, total_us, planes = parse_xplane(opt.outdir, opt.top)
    meta_path = os.path.join(opt.outdir, "capture_meta.json")
    meta = {}
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    report = {"planes": planes,
              "batch_pairs": meta.get("batch_pairs"),
              "segments_traced": meta.get(
                  "segments_to_trace", opt.segments_to_trace)}
    if ranked is None:
        report["device_trace"] = "NO TRACE CAPTURED"
    elif total_us == 0.0:
        report["device_trace"] = (
            "host-only capture: no device plane events (the tunneled "
            "runtime does not export TPU device traces)"
        )
    else:
        op_map = load_hlo_op_map(opt.outdir)
        if not op_map:
            print("# WARNING: no hlo_*.txt.gz dumps found — op names "
                  "cannot be attributed (re-capture with this script "
                  "version)", file=sys.stderr)

        def resolve(name):
            # trace names are HLO instruction names; strip a trailing
            # duplicate-suffix if the exact name is absent
            if name in op_map:
                return op_map[name]
            return op_map.get(name.split(" ")[0], "")

        report["total_device_ms"] = round(total_us / 1e3, 2)
        report["top_ops"] = [
            {"op": name, "self_ms": round(us / 1e3, 3),
             "pct": round(100.0 * us / total_us, 2),
             "scope": resolve(name)}
            for name, us in ranked
        ]
        # category aggregation over ALL rows (not just top): re-parse with
        # a huge top to get the full table
        full, _tot, _ = parse_xplane(opt.outdir, 10**9)
        cats = {}
        unattributed = 0.0
        for name, us in full:
            scope = resolve(name)
            if scope:
                cats[categorize(scope)] = cats.get(
                    categorize(scope), 0.0) + us
            else:
                unattributed += us
        report["categories"] = {
            k: {"ms": round(v / 1e3, 2),
                "pct": round(100.0 * v / total_us, 2)}
            for k, v in sorted(cats.items(), key=lambda kv: -kv[1])
        }
        report["unattributed_pct"] = round(
            100.0 * unattributed / total_us, 2)
    out_path = os.path.join(opt.outdir, "ddim_trace_report.json")
    with open(out_path, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps({k: v for k, v in report.items() if k != "top_ops"}))
    for row in report.get("top_ops", [])[:25]:
        scope = row.get("scope", "")
        tail = f"  <- {scope[-90:]}" if scope else ""
        print(f"{row['pct']:6.2f}%  {row['self_ms']:10.3f} ms  "
              f"{row['op']}{tail}")


if __name__ == "__main__":
    main()
