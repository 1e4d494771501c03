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

Overload semantics: `max_queue > 0` bounds the request queue; a `submit`
against a full queue waits up to `submit_timeout_s` then raises
`OverloadedError` (the HTTP front maps it to 503) — memory stays bounded
and callers get a clean, immediate rejection instead of unbounded queue
growth. `stop()` stops ACCEPTING first, then drains everything already
accepted (no accepted request is ever dropped). End-to-end request
latency (submit -> future resolved) is tracked in a fixed-size window;
`latency_stats()` reports p50/p95/p99.
"""
from __future__ import annotations

import collections
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


class OverloadedError(RuntimeError):
    """The request queue is full (or the service stopped accepting)."""


@dataclass
class _Request:
    sample: Dict[str, Any]
    future: Future = field(default_factory=Future)
    t_submit: float = field(default_factory=time.monotonic)


def stack_samples(samples) -> Dict[str, Any]:
    """Per-sample trees (no batch dim) -> one batched tree."""
    return jax.tree.map(lambda *xs: np.stack(xs), *samples)


class InpaintService:
    """Batched inpainting with dynamic request coalescing.

    pipeline_kwargs are forwarded to `make_inpaint_pipeline` (num_steps,
    guidance_scale, sampler, sample_segments, ...). `batch_pairs` is the
    compiled batch size; `max_wait_ms` bounds the latency a lone request
    pays waiting for the batch to fill.

    `max_queue > 0` bounds the number of queued (not-yet-dispatched)
    requests; a submit against a full queue blocks up to `submit_timeout_s`
    (default: reject immediately) then raises OverloadedError. 0 keeps the
    queue unbounded. `latency_window` sizes the rolling end-to-end latency
    sample for `latency_stats()`.
    """

    def __init__(
        self,
        model,
        params: Params,
        batch_pairs: int = 4,
        max_wait_ms: float = 50.0,
        rng_seed: int = 0,
        autostart: bool = True,
        max_queue: int = 0,
        submit_timeout_s: float = 0.0,
        latency_window: int = 1024,
        **pipeline_kwargs,
    ):
        from mobi_tpu.pipeline import make_inpaint_pipeline

        self._pipeline = make_inpaint_pipeline(model, **pipeline_kwargs)
        self._params = params
        self._batch_pairs = int(batch_pairs)
        self._max_wait = float(max_wait_ms) / 1e3
        self._base_key = jax.random.PRNGKey(rng_seed)
        self.max_queue = int(max_queue)
        self._submit_timeout = float(submit_timeout_s)
        self._queue: queue.Queue = queue.Queue(maxsize=self.max_queue)
        self._lock = threading.Lock()
        self.stats = {
            "batches": 0, "samples": 0, "padded": 0, "errors": 0,
            "rejected": 0,
        }
        self._latencies: collections.deque = collections.deque(
            maxlen=int(latency_window)
        )
        self._accepting = True
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

    def submit(
        self, sample: Dict[str, Any], timeout: Optional[float] = None
    ) -> Future:
        """Enqueue one sample (per-sample dict schema, no batch dim).
        The Future resolves to {"camera": [H,W,3], "lidar": [H,W,2], ...}
        (whatever decode_sample produces, without the batch dim).

        Raises OverloadedError when the bounded queue stays full past
        `timeout` (defaults to the service's submit_timeout_s) or after
        stop() — the caller sheds load instead of the service growing an
        unbounded backlog."""
        if not self._accepting:
            raise OverloadedError("service is stopping; submit rejected")
        req = _Request(sample)
        timeout = self._submit_timeout if timeout is None else float(timeout)
        try:
            if timeout > 0:
                self._queue.put(req, timeout=timeout)
            else:
                self._queue.put_nowait(req)
        except queue.Full:
            with self._lock:
                self.stats["rejected"] += 1
            raise OverloadedError(
                f"request queue full ({self.max_queue}); retry later"
            ) from None
        return req.future

    def latency_stats(self) -> Dict[str, float]:
        """p50/p95/p99 end-to-end (submit -> result) latency in seconds over
        the rolling window, plus the window's sample count."""
        with self._lock:
            lats = sorted(self._latencies)
        if not lats:
            return {"latency_count": 0}
        n = len(lats)

        def pct(p: float) -> float:
            return lats[min(n - 1, int(round(p / 100.0 * (n - 1))))]

        return {
            "latency_count": n,
            "latency_p50_s": pct(50),
            "latency_p95_s": pct(95),
            "latency_p99_s": pct(99),
        }

    def stop(self, timeout: Optional[float] = None) -> None:
        """Stop accepting, process everything already accepted, then stop
        the dispatcher (graceful drain — accepted requests never drop)."""
        self._accepting = False
        if self._started:
            self._queue.put(_STOP)  # dispatcher is draining: always lands
            self._thread.join(timeout)
        else:
            try:
                self._queue.put_nowait(_STOP)
            except queue.Full:
                pass

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
            now = time.monotonic()
            with self._lock:
                self._latencies.extend(now - r.t_submit for r in reqs)
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
