"""PrefetchLoader worker modes: thread and process workers must yield the
SAME seed-deterministic batch sequence (the multi-host contract — every
process consumes batch i of the same epoch order at step i,
mesh.shard_batch), and worker failures must surface in the consumer.

Process workers are the torch per-GPU dataloader-workers analogue
(/root/reference/configs/mobi_nusc_512.yaml:15) for multi-core hosts where
the GIL caps the cv2/numpy `__getitem__` pipeline; spawned, so the dataset
pickles by value and workers never touch jax.
"""
import numpy as np
import pytest

from mobi_tpu.data.loader import PrefetchLoader


def _data(n=37):
    return [{"x": np.full((3,), i, np.float32), "id_name": f"s{i}"}
            for i in range(n)]


def _sequence(loader):
    return [b["x"].copy() for b in loader]


class RaisingDataset:
    """Picklable dataset that fails on a late index (spawn-safe:
    module-level class)."""

    def __len__(self):
        return 16

    def __getitem__(self, i):
        if i == 11:
            raise ValueError("boom at 11")
        return {"x": np.full((2,), i, np.float32)}


def test_thread_workers_are_order_deterministic():
    """num_threads > 1 must reproduce the single-worker sequence exactly:
    completions are re-sequenced by batch index, not yielded as they
    finish."""
    ref = _sequence(PrefetchLoader(_data(), 4, shuffle=True, seed=3,
                                   num_threads=1))
    for trial in range(3):  # scheduling varies run to run
        got = _sequence(PrefetchLoader(_data(), 4, shuffle=True, seed=3,
                                       num_threads=4, prefetch=2))
        assert len(got) == len(ref)
        for i, (a, b) in enumerate(zip(got, ref)):
            np.testing.assert_array_equal(a, b, err_msg=f"batch {i}")


def test_process_workers_match_threads():
    """num_procs=2 spawned workers == the single-thread sequence, batch for
    batch (and string fields survive the pickle round-trip)."""
    ref = PrefetchLoader(_data(), 4, shuffle=True, seed=7, num_threads=1)
    got = PrefetchLoader(_data(), 4, shuffle=True, seed=7, num_procs=2,
                         prefetch=2)
    ref_batches = list(ref)
    got_batches = list(got)
    assert len(got_batches) == len(ref_batches) == 9
    for i, (a, b) in enumerate(zip(got_batches, ref_batches)):
        np.testing.assert_array_equal(a["x"], b["x"], err_msg=f"batch {i}")
        assert a["id_name"] == b["id_name"]


def test_process_workers_compose_with_sharding():
    """Process workers keep the multi-host slice layout: shard slices
    concatenate, in process order, into the single-process batches."""
    ref = list(PrefetchLoader(_data(), 8, shuffle=True, seed=5,
                              num_threads=1))
    shards = [
        list(PrefetchLoader(_data(), 4, shuffle=True, seed=5, num_procs=2,
                            shard_index=i, num_shards=2))
        for i in range(2)
    ]
    assert len(shards[0]) == len(shards[1]) == len(ref)
    for ref_b, b0, b1 in zip(ref, shards[0], shards[1]):
        np.testing.assert_array_equal(
            np.concatenate([b0["x"], b1["x"]]), ref_b["x"]
        )


def test_process_worker_error_propagates():
    ld = PrefetchLoader(RaisingDataset(), 4, shuffle=False, num_procs=2)
    with pytest.raises(RuntimeError, match="boom at 11"):
        list(ld)


def test_thread_worker_error_propagates():
    ld = PrefetchLoader(RaisingDataset(), 4, shuffle=False, num_threads=2)
    with pytest.raises(ValueError, match="boom at 11"):
        list(ld)


def test_early_consumer_exit_cleans_up_processes():
    """Breaking out of the iterator mid-epoch must not leave live worker
    processes (or deadlock on a full queue)."""
    import multiprocessing
    import time

    before = len(multiprocessing.active_children())
    ld = PrefetchLoader(_data(64), 4, shuffle=True, seed=1, num_procs=2,
                        prefetch=1)
    it = iter(ld)
    next(it)
    it.close()  # triggers the generator's finally: stop + drain + join
    deadline = time.monotonic() + 15  # reaping terminated children is async
    while time.monotonic() < deadline:
        if len(multiprocessing.active_children()) <= before:
            break
        time.sleep(0.2)
    assert len(multiprocessing.active_children()) <= before
