"""Host input-pipeline throughput: can the host feed the chip?

Times NuScenesDataset.__getitem__ (cv2 masks, crops, range transforms) and
the PrefetchLoader — thread workers AND spawned process workers (the torch
num_workers analogue; --procs) — at the production 512x512 config over the
synthetic database, and compares with the chip's consumption rate from
bench.py (BATCH_PAIRS / steady-state seconds).

  python scripts/bench_host_pipeline.py [--samples 32] [--threads 4]
      [--procs 2]

Prints one JSON line with raw samples/s, per-mode loader samples/s, and the
ratio of the best mode to the chip rate (>1 means the host keeps up). On a
1-core host expect BOTH worker modes to lose to raw iteration (threads:
GIL + switch overhead; processes: spawn + pickle transfer of full batches);
the process mode exists for multi-core hosts where the GIL caps the mixed
cv2/numpy pipeline.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--samples", type=int, default=32)
    p.add_argument("--threads", type=int, default=4)
    p.add_argument("--procs", type=int, default=2,
                   help="process-worker count for the A/B leg (0 skips)")
    p.add_argument("--batch-size", type=int, default=4)
    p.add_argument(
        "--chip-rate", type=float, default=0.34,
        help="pairs/s the chip consumes (bench.py steady state: "
             "BATCH_PAIRS=4 / 11.65 s)",
    )
    args = p.parse_args(argv)

    from mobi_tpu.data.loader import PrefetchLoader
    from mobi_tpu.data.nuscenes import NuScenesDataset, collate
    from mobi_tpu.data.synthetic import build_synthetic_database

    with tempfile.TemporaryDirectory() as root:
        t0 = time.perf_counter()
        db = build_synthetic_database(
            root, num_scenes=4, objects_per_scene=4,
            img_w=1600, img_h=900,  # native nuScenes camera resolution
        )
        print(f"# synthetic db built in {time.perf_counter() - t0:.1f}s",
              file=sys.stderr)
        ds = NuScenesDataset(
            state="train", object_classes=["car", "pedestrian"],
            use_camera=True, use_lidar=True,
            image_height=512, image_width=512,
            range_height=512, range_width=512,
            ref_aug=True, range_int_norm=True, min_lidar_points=1,
            reference_image_min_h=1, reference_image_min_w=1,
            num_samples_per_class=max(8, args.samples),
            fixed_sampling=False, seed=0, **db,
        )

        # raw __getitem__
        n = min(args.samples, len(ds))
        _ = ds[0]  # warm caches
        t0 = time.perf_counter()
        for i in range(n):
            _ = ds[i % len(ds)]
        raw_dt = time.perf_counter() - t0
        raw_rate = n / raw_dt

        # loader A/B: thread workers vs spawned process workers
        def time_loader(**kw):
            loader = PrefetchLoader(
                ds, batch_size=args.batch_size, shuffle=True, prefetch=4,
                **kw,
            )
            seen = 0
            t0 = time.perf_counter()
            for batch in loader:
                seen += args.batch_size
                if seen >= n:
                    break
            return seen / (time.perf_counter() - t0)

        thread_rate = time_loader(num_threads=args.threads)
        proc_rate = (
            time_loader(num_threads=1, num_procs=args.procs)
            if args.procs > 0 else None
        )

    best = max(thread_rate, proc_rate or 0.0)
    print(json.dumps({
        "metric": "host_pipeline_samples_per_s",
        "raw_getitem_per_s": round(raw_rate, 3),
        "loader_threads_per_s": round(thread_rate, 3),
        "loader_procs_per_s": (
            round(proc_rate, 3) if proc_rate is not None else None
        ),
        "threads": args.threads,
        "procs": args.procs,
        "cpu_count": os.cpu_count(),
        "chip_pairs_per_s": args.chip_rate,
        "headroom_x": round(best / args.chip_rate, 2),
    }))


if __name__ == "__main__":
    main()
