"""scripts/serve_loadgen.py driven end-to-end against the tiny CPU server.

Covers the load generator itself (payload schema, warmup, threaded client
fan-out, stats fetch, JSON report) — the serving *service* semantics are
pinned in tests/test_serve.py. Reference analogue: the batch loop of
/root/reference/scripts/inference_test_bench.py:423-461 generalized to
concurrent network callers.
"""
import json
import threading

import jax
import numpy as np
import pytest

from mobi_tpu.serve import InpaintService
from tests.test_diffusion import make_batch, tiny_model_and_params


@pytest.fixture(scope="module")
def server(cpu_devices):
    from scripts.serve import make_server

    model, params = tiny_model_and_params()
    params = jax.device_put(params, cpu_devices[0])
    svc = InpaintService(
        model, params, batch_pairs=2, max_wait_ms=50,
        num_steps=2, guidance_scale=2.0, sampler="ddim",
    )
    srv = make_server(svc, port=0)
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    yield srv.server_address[1], svc
    srv.shutdown()
    srv.server_close()
    svc.stop(timeout=60)


def test_make_sample_matches_service_schema():
    """Loadgen payload tree == the pipeline's expected sample tree
    (keys and per-sample ranks), so a loadgen request is representative."""
    from scripts.serve import flatten_tree
    from scripts.serve_loadgen import make_sample

    want = flatten_tree(
        jax.tree.map(lambda x: np.asarray(x)[0], make_batch(b=1))
    )
    got = make_sample(np.random.default_rng(0), 32, 32)
    assert set(got) == set(want)
    for k in want:
        assert got[k].ndim == want[k].ndim, k
        assert got[k].dtype == np.float32, k


def test_saturation_sheds_load_with_503(cpu_devices):
    """Offered load > capacity against a bounded queue: the HTTP front
    answers 503 (Retry-After) for the overflow, every accepted request
    completes, the backlog never exceeds max_queue (bounded memory), and
    the books balance: served + rejected == offered."""
    import io
    import threading
    import urllib.error
    import urllib.request

    from scripts.serve import encode_npz, flatten_tree, make_server
    from scripts.serve_loadgen import make_sample

    model, params = tiny_model_and_params()
    params = jax.device_put(params, cpu_devices[0])
    svc = InpaintService(
        model, params, batch_pairs=1, max_wait_ms=5, max_queue=1,
        num_steps=2, guidance_scale=2.0, sampler="ddim",
    )
    srv = make_server(svc, port=0)
    port = srv.server_address[1]
    t = threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    body = encode_npz(make_sample(np.random.default_rng(1), 32, 32))
    url = f"http://127.0.0.1:{port}/inpaint"

    def post():
        req = urllib.request.Request(url, data=body, method="POST")
        with urllib.request.urlopen(req, timeout=600) as r:
            resp = r.read()
        with np.load(io.BytesIO(resp)) as z:
            assert all(np.isfinite(z[k]).all() for k in z.files)

    try:
        post()  # warm the compiled pipeline so batch time is steady

        n = 12
        served, rejected, errors = [], [], []
        lock = threading.Lock()

        def client(i):
            try:
                post()
                with lock:
                    served.append(i)
            except urllib.error.HTTPError as e:
                if e.code == 503 and e.headers.get("Retry-After"):
                    with lock:
                        rejected.append(i)
                else:
                    with lock:
                        errors.append(f"{e.code}: {e}")
            except Exception as e:
                with lock:
                    errors.append(f"{type(e).__name__}: {e}")

        threads = [threading.Thread(target=client, args=(i,))
                   for i in range(n)]
        for th in threads:
            th.start()
        for th in threads:
            th.join()

        assert not errors, errors
        assert len(served) + len(rejected) == n
        # batch_pairs=1 serving 12 near-simultaneous posts against a
        # 1-deep queue MUST shed some and serve some
        assert len(rejected) >= 1, "saturation produced no 503s"
        assert len(served) >= 1, "overload rejected everything"
        assert svc.stats["rejected"] >= len(rejected)
        assert svc._queue.qsize() <= 1  # backlog stayed bounded
    finally:
        srv.shutdown()
        srv.server_close()
        svc.stop(timeout=60)
    # graceful drain: stop() leaves no unresolved accepted request
    assert svc.stats["samples"] == len(served) + 1  # + warmup


def test_loadgen_main_reports_latency_and_stats(server, capsys):
    from scripts import serve_loadgen

    import sys

    port, svc = server
    base = svc.stats["samples"]

    argv = sys.argv
    sys.argv = [
        "serve_loadgen.py", "--port", str(port), "--n", "4",
        "--clients", "4", "--warmup", "1", "--h", "32", "--w", "32",
        "--timeout", "600",
    ]
    try:
        serve_loadgen.main()
    finally:
        sys.argv = argv

    report = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert report["n"] == 4
    assert report["served_per_hour"] > 0
    assert 0 < report["latency_p50_s"] <= report["latency_p95_s"]
    assert report["server_stats"]["errors"] == 0
    assert report["server_stats"]["samples"] >= base + 5  # warmup + 4
