#!/usr/bin/env python
"""HTTP inference server for mobi_tpu inpainting (stdlib only).

Thin network front over `mobi_tpu.serve.InpaintService` (which owns the
dynamic batching and the single device-dispatch thread — see its module
docstring). Handler threads block on their request's Future, so concurrent
HTTP clients coalesce into full device batches automatically.

Protocol (all binary bodies are npz):
  POST /inpaint   body = npz whose keys are '/'-joined sample-tree paths
                  (e.g. 'image/GT', 'lidar/range_data', 'image/cond/ref_image'),
                  each WITHOUT a leading batch dim. Response: npz with the
                  decode_sample outputs ('camera', 'lidar').
  GET  /healthz   -> {"ok": true}
  GET  /stats     -> service counters (batches, samples, padded, errors,
                  rejected) + rolling latency percentiles (p50/p95/p99)

Overload: with --max-queue set, a request arriving against a full queue is
rejected with HTTP 503 + Retry-After (mobi_tpu.serve.OverloadedError) —
bounded memory under any offered load; clients shed and retry.

Usage:
  /opt/venv/bin/python scripts/serve.py --config configs/mobi_nusc_512.yaml
      [--ckpt ckpt] [--port 8476] [--batch-pairs 20] [--ddim_steps 50]
      [--scale 5.0] [--max-wait-ms 200] [--sample-segments 5]
      [--max-queue 64] [--submit-timeout-s 0]

The reference has no serving surface; its batch loop
(/root/reference/scripts/inference_test_bench.py:423-461) is the closest
analogue, generalized here to concurrent callers.
"""
from __future__ import annotations

import argparse
import io
import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def flatten_tree(tree, prefix=""):
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else k
        if isinstance(v, dict):
            out.update(flatten_tree(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def unflatten_tree(flat):
    tree: dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return tree


def encode_npz(flat: dict) -> bytes:
    buf = io.BytesIO()
    np.savez_compressed(buf, **flat)
    return buf.getvalue()


def decode_npz(body: bytes) -> dict:
    with np.load(io.BytesIO(body)) as z:
        return {k: z[k] for k in z.files}


def make_server(service, port: int = 0) -> ThreadingHTTPServer:
    """Build (not start) the HTTP server around an InpaintService —
    separated from main() so tests can serve a tiny CPU model."""

    class Handler(BaseHTTPRequestHandler):
        def log_message(self, *a):  # quiet; stats are on /stats
            pass

        def _json(self, obj, code=200):
            body = json.dumps(obj).encode()
            self.send_response(code)
            self.send_header("Content-Type", "application/json")
            self.send_header("Content-Length", str(len(body)))
            self.end_headers()
            self.wfile.write(body)

        def do_GET(self):
            if self.path == "/healthz":
                self._json({"ok": True})
            elif self.path == "/stats":
                self._json({**service.stats, **service.latency_stats()})
            else:
                self._json({"error": "not found"}, 404)

        def do_POST(self):
            from mobi_tpu.serve import OverloadedError

            if self.path != "/inpaint":
                self._json({"error": "not found"}, 404)
                return
            try:
                n = int(self.headers.get("Content-Length", "0"))
                sample = unflatten_tree(decode_npz(self.rfile.read(n)))
                out = service.submit(sample).result()
                body = encode_npz({k: np.asarray(v) for k, v in out.items()})
                self.send_response(200)
                self.send_header("Content-Type", "application/npz")
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)
            except OverloadedError as e:
                self.send_response(503)
                self.send_header("Retry-After", "1")
                b = json.dumps({"error": f"overloaded: {e}"}).encode()
                self.send_header("Content-Type", "application/json")
                self.send_header("Content-Length", str(len(b)))
                self.end_headers()
                self.wfile.write(b)
            except Exception as e:
                self._json({"error": f"{type(e).__name__}: {e}"}, 500)

    return ThreadingHTTPServer(("127.0.0.1", port), Handler)


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--config", required=True)
    p.add_argument("--ckpt", default="")
    p.add_argument("--port", type=int, default=8476)
    p.add_argument("--batch-pairs", dest="batch_pairs", type=int, default=20)
    p.add_argument("--ddim_steps", type=int, default=50)
    p.add_argument("--scale", type=float, default=5.0)
    p.add_argument("--plms", action="store_true")
    p.add_argument("--max-wait-ms", dest="max_wait_ms", type=float,
                   default=200.0)
    p.add_argument("--sample-segments", dest="sample_segments", type=int,
                   default=int(os.environ.get("MOBI_ITB_SEGMENTS", "1")))
    p.add_argument("--max-queue", dest="max_queue", type=int, default=0,
                   help="bound the request queue; 0 = unbounded. Full "
                        "queue -> HTTP 503")
    p.add_argument("--submit-timeout-s", dest="submit_timeout_s", type=float,
                   default=0.0,
                   help="how long a submit may wait for queue space before "
                        "503 (0 = reject immediately)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("overrides", nargs="*")
    opt = p.parse_args(argv)

    import jax

    from mobi_tpu.models.diffusion import MobiDiffusion
    from mobi_tpu.serve import InpaintService
    from mobi_tpu.utils.cache import enable_compilation_cache
    from mobi_tpu.utils.config import load_config, mobi_config_from_yaml

    enable_compilation_cache()
    cfg = load_config([opt.config], [s for s in opt.overrides if "=" in s])
    mcfg = mobi_config_from_yaml(cfg)
    model = MobiDiffusion(mcfg)

    # checkpoint resolution mirrors inference_test_bench.py: orbax manager
    # dir (EMA-aware), torch .ckpt/.pth file, or cached random init (smoke)
    rng = jax.random.PRNGKey(opt.seed)
    use_ema = bool(cfg["model"]["params"].get("use_ema", False))
    if opt.ckpt and os.path.isdir(opt.ckpt):
        from mobi_tpu.checkpoint import CheckpointManager

        mgr = CheckpointManager(opt.ckpt)
        restored = mgr.restore()
        params = restored["params"]
        if use_ema and restored.get("ema") is not None:
            params = {**params, "unet": restored["ema"]["ema_params"]}
            print("serving EMA weights (ema_scope)")
    else:
        from mobi_tpu.utils.param_cache import cached_init

        params = cached_init(
            lambda r: model.init_params(r), rng, repr(mcfg),
            shape_fn=lambda r: model.init_params(r, on_cpu=False),
        )
        if opt.ckpt:
            from mobi_tpu.checkpoint import load_torch_checkpoint, restore_partial
            from mobi_tpu.import_torch import (
                extract_ema_state_dict,
                import_mobi_checkpoint,
            )

            print(f"loading torch checkpoint {opt.ckpt}")
            sd = load_torch_checkpoint(opt.ckpt)
            if use_ema:
                ema_sd, _ = extract_ema_state_dict(sd)
                if ema_sd is not None:
                    sd = {**sd, **ema_sd}
                    print("serving EMA weights (ema_scope)")
            params = restore_partial(params, import_mobi_checkpoint(
                sd,
                channel_mult=tuple(mcfg.unet_channel_mult),
                num_res_blocks=mcfg.unet_num_res_blocks,
                attention_resolutions=tuple(mcfg.unet_attention_resolutions),
                vae_resolution=mcfg.image_height,
            ))
        else:
            print("WARNING: no --ckpt, serving RANDOM weights (smoke mode)")
    params = jax.device_put(params, jax.devices()[0])

    service = InpaintService(
        model, params, batch_pairs=opt.batch_pairs,
        max_wait_ms=opt.max_wait_ms, rng_seed=opt.seed,
        max_queue=opt.max_queue, submit_timeout_s=opt.submit_timeout_s,
        num_steps=opt.ddim_steps, guidance_scale=opt.scale,
        sampler="plms" if opt.plms else "ddim",
        sample_segments=opt.sample_segments,
    )
    server = make_server(service, opt.port)
    print(f"serving on http://127.0.0.1:{server.server_address[1]} "
          f"(batch_pairs={opt.batch_pairs}, steps={opt.ddim_steps})",
          flush=True)
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        server.server_close()
        service.stop(timeout=60)


if __name__ == "__main__":
    main()
