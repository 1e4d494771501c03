"""Dynamic-batching inference service over the inpaint pipeline.

TPU programs are compiled for ONE fixed batch shape, so a serving layer's
job is to coalesce concurrent single-sample requests into that compiled
batch size: `submit()` enqueues one (camera, lidar) request and returns a
Future; a dispatcher thread drains the queue, waits up to `max_wait_ms`
for the batch to fill, pads a short tail batch by repeating its last
sample (the device executes full batches either way — padding changes
nothing for the real samples, pinned by tests/test_serve.py), runs the
jitted pipeline, and fans per-sample outputs back to the futures.

The reference has no serving story — its closest surface is the serial
batch loop of scripts/inference_test_bench.py:423-461, which this
generalizes to concurrent callers (beyond-reference, TPU-production
surface). A single dispatcher thread owns all device dispatch: one JAX
client per process is the rule on the tunneled runtime, and it also makes
batch assembly deterministic.

Request samples use the per-sample dict schema of
`NuScenesDataset.__getitem__` (leaves WITHOUT a leading batch dim — the
service stacks them, exactly like `PrefetchLoader` does for training).
Sampling noise is deterministic per batch: `fold_in(base_key, batch_idx)`.
"""
from __future__ import annotations

import queue
import threading
import time
from concurrent.futures import Future
from dataclasses import dataclass, field
from typing import Any, Dict, Optional

import jax
import numpy as np

Params = Any
_STOP = object()


@dataclass
class _Request:
    sample: Dict[str, Any]
    future: Future = field(default_factory=Future)


def stack_samples(samples) -> Dict[str, Any]:
    """Per-sample trees (no batch dim) -> one batched tree."""
    return jax.tree.map(lambda *xs: np.stack(xs), *samples)


class InpaintService:
    """Batched inpainting with dynamic request coalescing.

    pipeline_kwargs are forwarded to `make_inpaint_pipeline` (num_steps,
    guidance_scale, sampler, sample_segments, ...). `batch_pairs` is the
    compiled batch size; `max_wait_ms` bounds the latency a lone request
    pays waiting for the batch to fill.
    """

    def __init__(
        self,
        model,
        params: Params,
        batch_pairs: int = 4,
        max_wait_ms: float = 50.0,
        rng_seed: int = 0,
        autostart: bool = True,
        **pipeline_kwargs,
    ):
        from mobi_tpu.pipeline import make_inpaint_pipeline

        self._pipeline = make_inpaint_pipeline(model, **pipeline_kwargs)
        self._params = params
        self._batch_pairs = int(batch_pairs)
        self._max_wait = float(max_wait_ms) / 1e3
        self._base_key = jax.random.PRNGKey(rng_seed)
        self._queue: queue.Queue = queue.Queue()
        self._lock = threading.Lock()
        self.stats = {"batches": 0, "samples": 0, "padded": 0, "errors": 0}
        self._thread = threading.Thread(
            target=self._dispatch_loop, name="inpaint-dispatcher", daemon=True
        )
        self._started = False
        if autostart:
            self.start()

    # ------------------------------------------------------------- public
    def start(self) -> "InpaintService":
        if not self._started:
            self._started = True
            self._thread.start()
        return self

    def submit(self, sample: Dict[str, Any]) -> Future:
        """Enqueue one sample (per-sample dict schema, no batch dim).
        The Future resolves to {"camera": [H,W,3], "lidar": [H,W,2], ...}
        (whatever decode_sample produces, without the batch dim)."""
        req = _Request(sample)
        self._queue.put(req)
        return req.future

    def stop(self, timeout: Optional[float] = None) -> None:
        """Process everything already submitted, then stop the dispatcher."""
        self._queue.put(_STOP)
        if self._started:
            self._thread.join(timeout)

    def __enter__(self):
        return self.start()

    def __exit__(self, *exc):
        self.stop()

    # --------------------------------------------------------- dispatcher
    def _collect(self):
        """Block for the first request, then fill the batch for up to
        max_wait_ms. Returns (requests, saw_stop)."""
        first = self._queue.get()
        if first is _STOP:
            return [], True
        reqs = [first]
        deadline = time.monotonic() + self._max_wait
        while len(reqs) < self._batch_pairs:
            remaining = deadline - time.monotonic()
            if remaining <= 0:
                break
            try:
                nxt = self._queue.get(timeout=remaining)
            except queue.Empty:
                break
            if nxt is _STOP:
                return reqs, True
            reqs.append(nxt)
        return reqs, False

    def _run_batch(self, reqs) -> None:
        n_pad = self._batch_pairs - len(reqs)
        samples = [r.sample for r in reqs] + [reqs[-1].sample] * n_pad
        with self._lock:
            idx = self.stats["batches"]
            self.stats["batches"] += 1
            self.stats["samples"] += len(reqs)
            self.stats["padded"] += n_pad
        try:
            out = self._pipeline(
                self._params,
                stack_samples(samples),
                jax.random.fold_in(self._base_key, idx),
            )
            out = {k: np.asarray(v) for k, v in out.items()}
            for i, r in enumerate(reqs):
                r.future.set_result({k: v[i] for k, v in out.items()})
        except Exception as e:  # fan the failure out, keep serving
            with self._lock:
                self.stats["errors"] += 1
            for r in reqs:
                if not r.future.done():
                    r.future.set_exception(e)

    def _dispatch_loop(self) -> None:
        while True:
            reqs, saw_stop = self._collect()
            if reqs:
                self._run_batch(reqs)
            if saw_stop:
                # drain anything that raced in behind the sentinel
                leftovers = []
                while True:
                    try:
                        r = self._queue.get_nowait()
                    except queue.Empty:
                        break
                    if r is not _STOP:
                        leftovers.append(r)
                while leftovers:
                    chunk = leftovers[: self._batch_pairs]
                    leftovers = leftovers[self._batch_pairs :]
                    self._run_batch(chunk)
                return
