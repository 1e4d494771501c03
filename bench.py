"""End-to-end inference benchmark: joint camera+lidar 512x512 DDIM-50
object inpaints per hour per chip.

Measures the full production path of the reference's inference test bench
(/root/reference/scripts/inference_test_bench.py:407-461): CLIP+bbox
conditioning encode, camera+lidar VAE encodes of GT/inpaint frames, the
50-step CFG-doubled UNet denoising scan, and both VAE decodes — per inpainted
object (one camera frame + one range view each).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "inpaints/hour/chip", "vs_baseline": N}
vs_baseline is relative to the BASELINE.json north-star target of 1000
inpaints/hour/v5e-chip.
"""
from __future__ import annotations

import json
import os
import sys
import time

try:
    import jax  # noqa: F401 - probe the interpreter
except ModuleNotFoundError:  # pragma: no cover
    # Bare `python` on this machine (/usr/local/bin/python) has no
    # numpy/jax; re-exec under the project venv so `python bench.py` works
    # from any caller.
    venv = "/opt/venv/bin/python"
    # NB: compare prefixes, not realpaths — the venv python symlinks to the
    # same base interpreter
    if os.path.exists(venv) and not sys.prefix.startswith("/opt/venv"):
        os.execv(venv, [venv, os.path.abspath(__file__)] + sys.argv[1:])
    raise

import jax
import jax.numpy as jnp

from mobi_tpu.utils.cache import enable_compilation_cache

enable_compilation_cache()
import numpy as np

# (camera, lidar) pairs per device batch; 20 measured best on the v5e:
# the scaling curve is flat past eff-UNet-batch 80 (24 pairs = 1278.4/hr vs
# 20 = 1279.0/hr, measured with segmented sampling — PROFILE.md "Batch
# re-sweep"). MOBI_BENCH_BATCH_PAIRS overrides; the HBM pre-flight and
# segment sizing keep larger values safe.
BATCH_PAIRS = int(os.environ.get("MOBI_BENCH_BATCH_PAIRS", "20"))
# dp-sharded inference over N devices (mobi_tpu.pipeline): per-chip batch
# stays BATCH_PAIRS, the global batch is BATCH_PAIRS * N, and the reported
# value stays per-chip. 1 (default) = the single-chip program; >1 needs N
# devices (the v5e here has one — use JAX_PLATFORMS=cpu +
# --xla_force_host_platform_device_count for a scaling smoke).
MESH_DP = int(os.environ.get("MOBI_BENCH_MESH_DP", "1"))
# DDIM steps: 50 is the headline protocol; lower only for fault probing /
# smoke (MOBI_BENCH_STEPS) — never report a non-50-step number as headline.
STEPS = int(os.environ.get("MOBI_BENCH_STEPS", "50"))
GUIDANCE = 5.0
TARGET_PER_HOUR = 1000.0


def build():
    from mobi_tpu.models.diffusion import MobiConfig, MobiDiffusion
    from mobi_tpu.utils.param_cache import cached_init

    cfg = MobiConfig(dtype=jnp.bfloat16)
    model = MobiDiffusion(cfg)
    # Random-init params are identical run to run (fixed PRNGKey), and the
    # flagship init costs ~20-45 min of eager CPU compute on a 1-core host —
    # cached_init keeps the tree on disk keyed by (config repr, PRNG key)
    # and shape-validates it against eval_shape before reuse.
    params = cached_init(
        lambda r: model.init_params(r),
        jax.random.PRNGKey(0),
        repr(cfg),
        shape_fn=lambda r: model.init_params(r, on_cpu=False),
    )
    return model, params


def make_batch(b: int):
    rng = np.random.default_rng(0)
    f32 = np.float32

    def u(*shape):
        return jnp.asarray(rng.uniform(-1, 1, shape).astype(f32))

    return {
        "image": {
            "GT": u(b, 512, 512, 3),
            "inpaint_image": u(b, 512, 512, 3),
            "inpaint_mask": jnp.ones((b, 512, 512, 1), jnp.float32),
            "cond": {
                "ref_image": u(b, 224, 224, 3),
                "ref_bbox": jnp.asarray(
                    rng.uniform(0, 1, (b, 8, 3)).astype(f32)
                ),
            },
        },
        "lidar": {
            "range_data": u(b, 512, 512, 2),
            "range_data_inpaint": u(b, 512, 512, 2),
            "range_mask": jnp.ones((b, 512, 512, 1), jnp.float32),
            "cond": {
                "ref_bbox": jnp.asarray(
                    rng.uniform(0, 1, (b, 8, 3)).astype(f32)
                ),
            },
        },
    }


def probe_link(dev, log):
    """Measure the host<->device link before anything big moves.

    Round 4's scored number silently halved because the tunnel to the v5e
    degraded ~44x between capture windows (param transfer 1.3 s -> 57.4 s)
    and the bench had no way to see it. This probe times (a) a scalar
    execute+fetch round-trip (median of 5) and (b) a 32 MiB
    device_put + device_get each way, and the results ship in the output
    JSON so a degraded environment is diagnosed by the artifact itself.
    """
    import numpy as np

    probe_mib = float(os.environ.get("MOBI_BENCH_PROBE_MIB", "32"))
    diag = {}
    # RTT: tiny jitted increment + 4-byte fetch, repeated. First call
    # compiles (remote compile service) — warm it, then take the median.
    bump = jax.jit(lambda v: v + 1.0)
    x = jax.device_put(jnp.float32(0.0), dev)
    _ = float(bump(x))  # warm compile + cache
    rtts = []
    for _i in range(5):
        t = time.perf_counter()
        x = bump(x)
        _ = float(x)
        rtts.append(time.perf_counter() - t)
    rtts.sort()
    diag["rtt_ms"] = round(rtts[len(rtts) // 2] * 1e3, 1)

    a = np.random.default_rng(7).random(
        (int(probe_mib * 1024 * 1024 // 4),), dtype=np.float32
    )
    t = time.perf_counter()
    a_dev = jax.device_put(a, dev)
    jax.block_until_ready(a_dev)
    t_up = time.perf_counter() - t
    t = time.perf_counter()
    _back = jax.device_get(a_dev)  # no compile involved; pure transfer
    t_down = time.perf_counter() - t
    del a_dev, _back
    diag["link_up_mbps"] = round(probe_mib / max(t_up, 1e-9), 1)
    diag["link_down_mbps"] = round(probe_mib / max(t_down, 1e-9), 1)
    # device_put can complete asynchronously on this runtime even under
    # block_until_ready; the paired get cannot start returning data before
    # the put landed, so the round-trip number is the robust one.
    diag["link_roundtrip_mbps"] = round(
        2 * probe_mib / max(t_up + t_down, 1e-9), 1
    )
    diag["link_degraded"] = bool(
        diag["link_roundtrip_mbps"] < 4.0 or diag["rtt_ms"] > 500.0
    )
    log(
        f"link probe: rtt {diag['rtt_ms']} ms, up {diag['link_up_mbps']} "
        f"MB/s, down {diag['link_down_mbps']} MB/s"
        + (" [DEGRADED]" if diag["link_degraded"] else "")
    )
    return diag


def main():
    import sys

    def log(msg):
        print(f"# {time.strftime('%H:%M:%S')} {msg}", file=sys.stderr, flush=True)

    log("building model + params (CPU init)")
    model, params = build()
    batch = make_batch(BATCH_PAIRS)
    log(f"params ready; batch_pairs={BATCH_PAIRS} steps={STEPS}")

    # Pin params and the batch to the accelerator ONCE. Without this every
    # call re-transfers the ~3.4 GB fp32 parameter tree through the tunnel,
    # which dominated the r2 first measurement (~78 inpaints/hr).
    import os

    # bf16 parameter residency (PROFILE.md lever): the UNet computes in bf16
    # anyway, so pre-casting >=2-D weights halves the tunnel transfer and
    # removes the per-use fp32->bf16 converts. 1-D leaves (norm scales,
    # biases) stay fp32. MOBI_BENCH_BF16_PARAMS=0 opts out for A/B.
    if os.environ.get("MOBI_BENCH_BF16_PARAMS", "1") == "1":
        params = jax.tree.map(
            lambda x: x.astype(jnp.bfloat16)
            if (hasattr(x, "dtype") and x.dtype == jnp.float32 and x.ndim >= 2)
            else x,
            params,
        )
        log("params pre-cast to bf16 (>=2-D leaves)")
    mesh = None
    if MESH_DP > 1:
        from mobi_tpu.parallel.mesh import shard_batch
        from mobi_tpu.pipeline import inference_mesh, replicate_params

        mesh = inference_mesh(dp=MESH_DP)
        diag = probe_link(jax.devices()[0], log)
        batch = make_batch(BATCH_PAIRS * MESH_DP)  # per-chip batch constant
        log(f"dp-sharded over {MESH_DP} devices; transferring params ...")
        t_x = time.perf_counter()
        params = replicate_params(mesh, params)
        batch = shard_batch(mesh, batch)
        jax.block_until_ready(params)
        diag["param_transfer_s"] = round(time.perf_counter() - t_x, 2)
        log(f"transfer done in {diag['param_transfer_s']}s")
    else:
        dev = jax.devices()[0]
        diag = probe_link(dev, log)
        log(f"transferring params to {dev.platform} ...")
        t_x = time.perf_counter()
        params = jax.device_put(params, dev)
        batch = jax.device_put(batch, dev)
        jax.block_until_ready(params)
        diag["param_transfer_s"] = round(time.perf_counter() - t_x, 2)
        log(f"transfer done in {diag['param_transfer_s']}s")

    # default 1 = the faithful reference DDIM; >1 measures the opt-in
    # encoder-propagation mode (PROFILE.md) — never the headline number
    enc_interval = int(os.environ.get("MOBI_BENCH_ENCODER_INTERVAL", "1"))

    from mobi_tpu.pipeline import make_inpaint_pipeline

    # VAE-stage lax.map chunking (pipeline.py): the encode/decode temps set
    # the program's HBM peak, so chunking them unlocks batch sizes past the
    # unchunked 20-pair roofline. 0 disables. Single-device only.
    vae_chunk = int(os.environ.get("MOBI_BENCH_VAE_CHUNK", "0"))
    # Segmented sampling (pipeline.SegmentedInpaint): the tunneled runtime
    # kills single executes longer than ~1-2 min, which caps the monolithic
    # DDIM-50 program at ~20 pairs; N segments keep every dispatch short so
    # any batch size can run. Measured FREE at the default batch (56.30 s
    # seg5 vs 56.36 s monolithic — async dispatch hides the host loop), so
    # it ships as the default for robustness to the execute-time limit.
    # 1 = one fused program (the pre-segmentation headline path).
    segments = int(os.environ.get("MOBI_BENCH_SEGMENTS", "5"))
    inpaint = make_inpaint_pipeline(
        model, num_steps=STEPS, guidance_scale=GUIDANCE, sampler="ddim",
        encoder_interval=enc_interval, mesh=mesh,
        vae_chunk_pairs=0 if mesh is not None else vae_chunk,
        sample_segments=segments if enc_interval <= 1 else 1,
    )

    # warmup / compile (AOT so the HBM plan can be pre-flighted: an
    # over-budget program faults the tunneled device with an opaque
    # UNAVAILABLE instead of a clean OOM — utils/hbm.py)
    log("compiling + first run (cold compile can take many minutes)")
    t_c = time.perf_counter()
    from mobi_tpu.utils.hbm import assert_fits

    if hasattr(inpaint, "preflight"):  # SegmentedInpaint
        if inpaint.preflight(
            params, batch, jax.random.PRNGKey(1),
            label=f"inpaint (batch_pairs={BATCH_PAIRS})",
        ):
            log("HBM pre-flight ok (3 programs)")
    else:
        compiled = inpaint.lower(
            params, batch, jax.random.PRNGKey(1)
        ).compile()
        if assert_fits(
            compiled, label=f"inpaint pipeline (batch_pairs={BATCH_PAIRS})"
        ):
            log("HBM pre-flight ok")
        inpaint = compiled
    out = inpaint(params, batch, jax.random.PRNGKey(1))
    jax.block_until_ready(out)
    log(f"warmup done in {time.perf_counter() - t_c:.1f}s; timing")

    # depth-1 lookahead (MOBI_BENCH_LOOKAHEAD=0 for the serial A/B): batch
    # N+1 is dispatched BEFORE batch N's result probe is fetched, so the
    # device-side queue always holds the next program and the host's
    # fetch+dispatch round-trip (tunnel latency on this runtime) overlaps
    # compute instead of serializing after it. Every iteration still
    # fetches a scalar probe — on the tunneled runtime block_until_ready
    # can resolve before execution finishes (async dispatch); a host read
    # of the result cannot — the probe is just one batch behind.
    lookahead = os.environ.get("MOBI_BENCH_LOOKAHEAD", "1") == "1"
    n_iters = int(os.environ.get("MOBI_BENCH_ITERS", "5"))
    iter_walls = []
    prev = None
    t_prev = time.perf_counter()
    for i in range(n_iters):
        out = inpaint(params, batch, jax.random.PRNGKey(2 + i))
        if not lookahead:
            _ = float(out["camera"].reshape(-1)[0])
            iter_walls.append(time.perf_counter() - t_prev)
            t_prev = time.perf_counter()
        elif prev is not None:
            # batch i is already dispatched; this fetch resolves batch i-1,
            # so the inter-fetch delta is one steady-state batch wall
            _ = float(prev["camera"].reshape(-1)[0])
            iter_walls.append(time.perf_counter() - t_prev)
            t_prev = time.perf_counter()
        prev = out
    if lookahead:
        _ = float(prev["camera"].reshape(-1)[0])
        iter_walls.append(time.perf_counter() - t_prev)
    diag["iter_walls_s"] = [round(w, 2) for w in iter_walls]
    dt = sorted(iter_walls)[len(iter_walls) // 2]  # median
    global_pairs = BATCH_PAIRS * MESH_DP
    log(
        f"steady-state median {dt:.2f}s per global batch of {global_pairs} "
        f"(walls: {diag['iter_walls_s']})"
    )

    # Device-time cross-check: one serialized pass with a host-synced wall
    # per device program (prep / K sampling segments / decode). Each wall is
    # ~(device time + one 4-byte fetch RTT), so sum - n*RTT approximates
    # per-batch device time — if the wall-clock number above is much larger,
    # the gap is host/tunnel stall, not chip time, and the JSON says so.
    if hasattr(inpaint, "timed_call"):
        log("device-time cross-check (3 serialized passes: 1 warm + 2 timed)")
        inpaint.timed_call(
            params, batch, jax.random.PRNGKey(99)
        )  # warm the tiny sync-fetch programs
        passes = [
            inpaint.timed_call(params, batch, jax.random.PRNGKey(100 + i))[1]
            for i in range(2)
        ]
        rtt_s = diag["rtt_ms"] / 1e3
        # Per-program MINIMUM across the timed passes: the tunnel can stall
        # a single 4-byte fetch for MINUTES (measured: 564 s on one segment
        # fetch while the same segment took 10.85 s in the other pass), and
        # a stall only ever inflates a wall — min is the clean estimator of
        # device time + one fetch RTT.
        walls = [
            (name, min(p[i][1] for p in passes))
            for i, (name, _w) in enumerate(passes[0])
        ]
        stalls = {
            f"{name}#{j}": round(p[i][1], 2)
            for i, (name, w_min) in enumerate(walls)
            for j, p in enumerate(passes)
            if p[i][1] > 3.0 * w_min + 5.0
        }
        dev_est = max(sum(w for _n, w in walls) - len(walls) * rtt_s, 0.0)
        diag["program_walls_s"] = {n: round(w, 2) for n, w in walls}
        diag["device_s_per_batch"] = round(dev_est, 2)
        diag["host_overhead_s"] = round(dt - dev_est, 2)
        if stalls:
            diag["fetch_stalls_s"] = stalls
            log(f"WARNING: tunnel fetch stalls during cross-check: {stalls}")
        log(
            f"device ~{dev_est:.2f}s/batch vs wall {dt:.2f}s "
            f"(overhead {dt - dev_est:+.2f}s)"
        )
    else:
        dev_est = None

    env_degraded = bool(
        diag.get("link_degraded")
        or (dev_est is not None and dt > 1.25 * dev_est + 2 * rtt_s)
    )
    diag["env_degraded"] = env_degraded
    if env_degraded:
        log(
            "WARNING: environment degraded (slow tunnel and/or host stall "
            "dominating wall time) — the wall-clock headline under-reports "
            "the chip; see device_s_per_batch/link fields"
        )

    inpaints_per_sec = global_pairs / dt
    per_hour_per_chip = inpaints_per_sec * 3600.0 / MESH_DP
    record = {
        "metric": "joint cam+lidar 512x512 DDIM-50 CFG-5 inpaints (full pipeline: cond encode + 2x VAE enc/dec + UNet scan)",
        "value": round(per_hour_per_chip, 1),
        "unit": "inpaints/hour/chip",
        "vs_baseline": round(per_hour_per_chip / TARGET_PER_HOUR, 3),
    }
    if dev_est:
        # what the chip would sustain absent host/tunnel stalls — only a
        # diagnostic, never the headline
        record["device_basis_per_hour"] = round(
            global_pairs / dev_est * 3600.0 / MESH_DP, 1
        )
    record.update(diag)
    if MESH_DP > 1:
        record["n_chips"] = MESH_DP
        record["total_per_hour"] = round(per_hour_per_chip * MESH_DP, 1)
    print(json.dumps(record))


if __name__ == "__main__":
    main()
