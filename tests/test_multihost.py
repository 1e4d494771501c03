"""Multi-process (multi-host) training: 2-process localhost runtime vs the
single-process 8-device baseline.

The reference's only scaling mechanism is DDP over nodes x gpus
(/root/reference/main.py:510; scripts/train.sh). The TPU-native contract is
stronger: the SAME SPMD program over a global mesh must produce the SAME
losses whether its 8 devices live in one process or two — data sharding,
gradient all-reduce (gloo on CPU, ICI/DCN on pods), and the checkpoint
gather all included.
"""
import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
N_STEPS = 2


def _free_port():
    s = socket.socket()
    s.bind(("localhost", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _worker_env():
    env = dict(os.environ)
    # stock CPU jax: no axon TPU plugin (its sitecustomize registration is
    # gated on this var), 4 virtual devices per process, repo on the path
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # keep the two workers' step-compile times SYMMETRIC: with the shared
    # on-disk compilation cache, whichever worker compiles second loads an
    # AOT result in seconds while its peer compiles for a minute — a skew
    # that can outlast the ~30s gloo rendezvous window on a loaded host
    env["JAX_ENABLE_COMPILATION_CACHE"] = "false"
    return env


def test_loader_process_sharding():
    """Process slices reassemble, in process order, into exactly the
    single-process batches (the make_array_from_process_local_data layout
    contract)."""
    from mobi_tpu.data.loader import PrefetchLoader

    data = [{"x": np.full((3,), i, np.float32)} for i in range(37)]
    ref = PrefetchLoader(data, 8, shuffle=True, seed=5, num_threads=1)
    shards = [
        PrefetchLoader(data, 4, shuffle=True, seed=5, num_threads=1,
                       shard_index=i, num_shards=2)
        for i in range(2)
    ]
    assert len(ref) == len(shards[0]) == len(shards[1]) == 4
    for ref_b, b0, b1 in zip(iter(ref), iter(shards[0]), iter(shards[1])):
        merged = np.concatenate([b0["x"], b1["x"]])
        np.testing.assert_array_equal(merged, ref_b["x"])


def test_loader_shard_epoch_reshuffle():
    from mobi_tpu.data.loader import PrefetchLoader

    ld = PrefetchLoader(
        [{"x": np.float32([i])} for i in range(16)], 4, shuffle=True,
        seed=1, num_threads=1, shard_index=1, num_shards=2,
    )
    e1 = np.concatenate([b["x"] for b in ld]).ravel()
    e2 = np.concatenate([b["x"] for b in ld]).ravel()
    assert not np.array_equal(e1, e2)  # epoch-dependent order


def test_two_process_loss_parity(cpu_devices):
    """Two 4-device processes == one 8-device process, loss for loss, plus
    cross-process state gather equality (VERDICT r2 item 1's done-bar)."""
    from mobi_tpu.parallel.mesh import create_mesh
    from tests import mh_worker

    # single-process 8-device baseline, computed in THIS process
    mesh = create_mesh(devices=cpu_devices)
    base_losses, base_state = mh_worker.run_steps(
        mesh, mh_worker.global_batch(), n_steps=N_STEPS
    )
    import jax

    base_probe = float(
        np.asarray(
            jax.tree_util.tree_leaves(
                jax.device_get(base_state.params)["unet"]
            )[0],
            np.float64,
        ).sum()
    )

    port = _free_port()
    env = _worker_env()
    procs = [
        subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tests", "mh_worker.py"),
             str(i), "2", str(port), str(N_STEPS)],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            env=env, cwd=REPO, text=True,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=1200)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {i} failed:\n{out[-4000:]}"

    results = {}
    for out in outs:
        for line in out.splitlines():
            if line.startswith("MH_RESULT "):
                r = json.loads(line[len("MH_RESULT "):])
                results[r["process"]] = r
    assert set(results) == {0, 1}, f"missing worker results: {outs}"

    for i in (0, 1):
        np.testing.assert_allclose(
            results[i]["losses"], base_losses, rtol=2e-5,
            err_msg=f"process {i} losses diverged from single-process run",
        )
        # both ranks gathered identical post-step params equal to baseline's
        np.testing.assert_allclose(
            results[i]["param_probe"], base_probe, rtol=2e-5
        )
