"""Host input pipeline: threaded prefetching loader.

Replaces the reference's per-GPU torch DataLoader workers
(main.py DataModuleFromConfig, configs *num_workers_per_gpu*) with a
thread-pool prefetcher feeding fixed-shape numpy batches; device transfer
happens in the training loop via jax.device_put against the mesh sharding.
"""
from __future__ import annotations

import queue
import threading
from typing import Any, Callable, Iterator, Optional, Sequence

import numpy as np

from mobi_tpu.data.nuscenes import collate


class PrefetchLoader:
    def __init__(
        self,
        dataset,
        batch_size: int,
        shuffle: bool = True,
        num_threads: int = 4,
        prefetch: int = 4,
        seed: int = 0,
        drop_last: bool = True,
        shard_index: int = 0,
        num_shards: int = 1,
    ):
        """`batch_size` is per-process. With num_shards > 1 (multi-host:
        shard_index = jax.process_index(), num_shards = jax.process_count())
        every process computes the SAME seed-deterministic global epoch
        order over global batches of batch_size * num_shards samples and
        materializes only its contiguous slice — the torch
        DistributedSampler analogue, laid out so the slices concatenate in
        process order exactly as jax.make_array_from_process_local_data
        expects (mesh.shard_batch)."""
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.num_threads = max(1, num_threads)
        self.prefetch = prefetch
        self.seed = seed
        self.drop_last = drop_last
        assert 0 <= shard_index < num_shards
        self.shard_index = shard_index
        self.num_shards = num_shards
        self._epoch = 0

    @property
    def global_batch_size(self) -> int:
        return self.batch_size * self.num_shards

    def __len__(self) -> int:
        n = len(self.dataset) // self.global_batch_size
        if (not self.drop_last and self.num_shards == 1
                and len(self.dataset) % self.global_batch_size):
            n += 1
        return n

    def __iter__(self) -> Iterator[Any]:
        order = np.arange(len(self.dataset))
        if self.shuffle:
            np.random.default_rng(self.seed + self._epoch).shuffle(order)
        self._epoch += 1

        gbs = self.global_batch_size
        batches = [order[i : i + gbs] for i in range(0, len(order), gbs)]
        if self.drop_last or self.num_shards > 1:
            # multi-host never yields a ragged tail: every process must
            # dispatch the same global shapes or the collectives deadlock
            batches = [b for b in batches if len(b) == gbs]
        if self.num_shards > 1:
            lo = self.shard_index * self.batch_size
            batches = [b[lo : lo + self.batch_size] for b in batches]

        q: "queue.Queue" = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def worker(idx_batches):
            for idxs in idx_batches:
                if stop.is_set():
                    return
                try:
                    samples = [self.dataset[int(i)] for i in idxs]
                    q.put(("ok", collate(samples)))
                except Exception as e:  # surfaces in the consumer
                    q.put(("err", e))
                    return

        # round-robin split across threads, preserving interleaved order only
        # approximately (batch order is not semantically meaningful here)
        chunks = [batches[t :: self.num_threads] for t in range(self.num_threads)]
        threads = [
            threading.Thread(target=worker, args=(c,), daemon=True)
            for c in chunks
            if c
        ]
        for t in threads:
            t.start()

        try:
            for _ in range(len(batches)):
                kind, item = q.get()
                if kind == "err":
                    raise item
                yield item
        finally:
            stop.set()
