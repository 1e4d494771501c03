"""InpaintService dynamic batching: coalescing, tail padding, concurrency,
and the HTTP front — all on the tiny CPU model.

The core contract: a request's output depends only on (its sample, the
batch composition, the per-batch key) — padding the tail with repeats must
not leak into real samples, and the service's result for a batch must equal
the direct pipeline run on the same stacked batch with the same folded key.
"""
import json
import threading
import urllib.request

import jax
import numpy as np
import pytest

from mobi_tpu.pipeline import make_inpaint_pipeline
from mobi_tpu.serve import InpaintService, stack_samples
from tests.test_diffusion import make_batch, tiny_model_and_params

PIPE_KW = dict(num_steps=2, guidance_scale=2.0, sampler="ddim")


@pytest.fixture(scope="module")
def setup(cpu_devices):
    model, params = tiny_model_and_params()
    return model, jax.device_put(params, cpu_devices[0])


def _samples(n, seed=0):
    """n per-sample trees (no batch dim) from the batched fixture."""
    batch = make_batch(b=n, rng=np.random.default_rng(seed))
    return [
        jax.tree.map(lambda x: np.asarray(x)[i], batch) for i in range(n)
    ]


def _direct(model, params, samples, batch_idx=0, rng_seed=0):
    fn = make_inpaint_pipeline(model, **PIPE_KW)
    key = jax.random.fold_in(jax.random.PRNGKey(rng_seed), batch_idx)
    out = fn(params, stack_samples(samples), key)
    return {k: np.asarray(v) for k, v in out.items()}


def test_coalesced_batch_matches_direct(setup):
    model, params = setup
    samples = _samples(2)
    svc = InpaintService(
        model, params, batch_pairs=2, max_wait_ms=5000, autostart=False,
        **PIPE_KW,
    )
    futs = [svc.submit(s) for s in samples]
    svc.start()
    results = [f.result(timeout=300) for f in futs]
    svc.stop(timeout=60)

    assert svc.stats == {
        "batches": 1, "samples": 2, "padded": 0, "errors": 0, "rejected": 0,
    }
    ref = _direct(model, params, samples)
    for i, res in enumerate(results):
        for k, v in res.items():
            np.testing.assert_array_equal(
                v, ref[k][i], err_msg=f"sample {i} key {k}"
            )


def test_tail_padding_does_not_leak(setup):
    """3 requests into a compiled batch of 4: the pad slot is a repeat of
    the last sample, and every real sample's output equals the direct run
    of exactly that padded batch."""
    model, params = setup
    samples = _samples(3, seed=1)
    svc = InpaintService(
        model, params, batch_pairs=4, max_wait_ms=5000, autostart=False,
        **PIPE_KW,
    )
    futs = [svc.submit(s) for s in samples]
    svc.start()
    results = [f.result(timeout=300) for f in futs]
    svc.stop(timeout=60)

    assert svc.stats["padded"] == 1 and svc.stats["samples"] == 3
    ref = _direct(model, params, samples + [samples[-1]])
    for i, res in enumerate(results):
        for k, v in res.items():
            np.testing.assert_array_equal(v, ref[k][i])


def test_concurrent_submitters(setup):
    model, params = setup
    samples = _samples(6, seed=2)
    svc = InpaintService(
        model, params, batch_pairs=2, max_wait_ms=50, **PIPE_KW
    )
    results = [None] * 6

    def worker(i):
        results[i] = svc.submit(samples[i]).result(timeout=300)

    threads = [threading.Thread(target=worker, args=(i,)) for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    svc.stop(timeout=60)

    assert svc.stats["samples"] == 6 and svc.stats["errors"] == 0
    for res in results:
        assert res is not None
        assert all(np.isfinite(v).all() for v in res.values())


def test_error_fans_out_and_service_survives(setup):
    model, params = setup
    svc = InpaintService(
        model, params, batch_pairs=1, max_wait_ms=10, **PIPE_KW
    )
    bad = jax.tree.map(lambda x: x[..., :1], _samples(1)[0])  # wrong shapes
    with pytest.raises(Exception):
        svc.submit(bad).result(timeout=300)
    # a good request afterwards still serves
    good = svc.submit(_samples(1)[0]).result(timeout=300)
    svc.stop(timeout=60)
    assert svc.stats["errors"] == 1
    assert all(np.isfinite(v).all() for v in good.values())


def test_bounded_queue_rejects_cleanly(setup):
    """max_queue bounds the backlog: submits against a full queue raise
    OverloadedError immediately (counted in stats['rejected']), accepted
    requests all complete once the dispatcher drains, and a stopped
    service rejects instead of accepting work it will never run."""
    from mobi_tpu.serve import OverloadedError

    model, params = setup
    samples = _samples(4, seed=4)
    svc = InpaintService(
        model, params, batch_pairs=2, max_wait_ms=10, autostart=False,
        max_queue=2, **PIPE_KW,
    )
    accepted = [svc.submit(s) for s in samples[:2]]  # fills the queue
    with pytest.raises(OverloadedError):
        svc.submit(samples[2])
    with pytest.raises(OverloadedError):
        svc.submit(samples[3])
    assert svc.stats["rejected"] == 2

    svc.start()
    results = [f.result(timeout=300) for f in accepted]  # graceful drain
    svc.stop(timeout=60)
    assert svc.stats["samples"] == 2
    for res in results:
        assert all(np.isfinite(v).all() for v in res.values())

    with pytest.raises(OverloadedError, match="stopping"):
        svc.submit(samples[0])


def test_submit_timeout_waits_for_space(setup):
    """submit(timeout>0) blocks for queue space instead of rejecting
    immediately — with the dispatcher draining, the wait succeeds."""
    model, params = setup
    samples = _samples(3, seed=5)
    svc = InpaintService(
        model, params, batch_pairs=1, max_wait_ms=5, autostart=False,
        max_queue=1, **PIPE_KW,
    )
    first = svc.submit(samples[0])
    svc.start()  # dispatcher now drains; the next submit's wait succeeds
    futs = [svc.submit(s, timeout=300) for s in samples[1:]]
    results = [f.result(timeout=300) for f in [first] + futs]
    svc.stop(timeout=60)
    assert svc.stats["rejected"] == 0 and svc.stats["samples"] == 3
    for res in results:
        assert all(np.isfinite(v).all() for v in res.values())


def test_latency_stats(setup):
    model, params = setup
    svc = InpaintService(
        model, params, batch_pairs=2, max_wait_ms=10, **PIPE_KW
    )
    assert svc.latency_stats() == {"latency_count": 0}
    futs = [svc.submit(s) for s in _samples(4, seed=6)]
    for f in futs:
        f.result(timeout=300)
    svc.stop(timeout=60)
    ls = svc.latency_stats()
    assert ls["latency_count"] == 4
    assert 0 < ls["latency_p50_s"] <= ls["latency_p95_s"] <= ls["latency_p99_s"]


def test_http_roundtrip(setup):
    from scripts.serve import encode_npz, flatten_tree, make_server

    model, params = setup
    svc = InpaintService(
        model, params, batch_pairs=1, max_wait_ms=10, **PIPE_KW
    )
    server = make_server(svc, port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/healthz", timeout=30
        ) as r:
            assert json.loads(r.read()) == {"ok": True}

        sample = _samples(1, seed=3)[0]
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/inpaint",
            data=encode_npz(flatten_tree(sample)),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=600) as r:
            import io

            with np.load(io.BytesIO(r.read())) as z:
                out = {k: z[k] for k in z.files}

        ref = _direct(model, params, [sample], batch_idx=0)
        for k, v in out.items():
            np.testing.assert_array_equal(v, ref[k][0])

        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/stats", timeout=30
        ) as r:
            stats = json.loads(r.read())
        assert stats["samples"] == 1 and stats["errors"] == 0
    finally:
        server.shutdown()
        server.server_close()
        svc.stop(timeout=60)
