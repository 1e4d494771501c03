"""Multi-process (multi-host) runtime wiring.

The reference scales training with one torch-DDP process per GPU over NCCL
(/root/reference/main.py:510 forces ddp; scripts/train.sh runs 2 GPUs;
main.py:687-694 scales the LR by nodes x gpus). The TPU-native equivalent is
multi-controller JAX: every host runs the SAME SPMD program over one global
`Mesh` spanning all processes' devices, gradient all-reduce is inserted by
XLA and rides ICI/DCN, and hosts feed only their addressable shard of each
global batch (`jax.make_array_from_process_local_data`).

Contract mirrored from the reference run loop:
  * every process executes every jitted step/val/sampling computation (the
    collectives require it), with host-side RNG and control flow in lockstep;
  * file IO (checkpoints, metrics, collages, config dumps) happens on
    process 0 only — the DDP rank-0 convention;
  * the data loader yields each process a disjoint contiguous slice of the
    same seed-deterministic global batch (`PrefetchLoader` shard args), the
    DistributedSampler analogue.

On a real TPU pod `initialize()` is argless (JAX autodetects the
coordinator from the TPU metadata); on CPU/localhost it takes explicit
coordinator/num_processes/process_id and uses gloo collectives.
"""
from __future__ import annotations

import os
from typing import Any, Optional

Params = Any


def initialize(
    coordinator: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Join (or form) a multi-process JAX runtime. Returns True when a
    multi-process runtime was initialized, False for single-process runs.

    Resolution order: explicit args -> JAX_COORDINATOR_ADDRESS /
    JAX_NUM_PROCESSES / JAX_PROCESS_ID env (the names jax's own cluster
    detection uses) -> single-process (no-op). Must run before any other
    jax API touches the backend.
    """
    coordinator = coordinator or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])
    if coordinator is None and num_processes is None:
        return False

    import jax

    # CPU cross-process collectives need an explicit implementation; gloo is
    # the one shipped with jaxlib. Harmless on TPU (config is per-backend).
    if os.environ.get("JAX_PLATFORMS", "").startswith("cpu"):
        jax.config.update("jax_cpu_collectives_implementation", "gloo")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
    )
    # Establish the cross-process communicator NOW, while every process is
    # at the same (just-initialized) point: the first collective triggers
    # the backend's context rendezvous (gloo connectFullMesh on CPU), which
    # has a short timeout (~30s) — if it instead fired lazily inside the
    # first train step, a process whose compile ran long would miss it.
    barrier("mobi_dist_init")
    return True


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_main_process() -> bool:
    return process_index() == 0


def barrier(name: str = "mobi_barrier") -> None:
    """Block until every process reaches this point (no-op single-process)."""
    if process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def replicate_to_host(tree: Params, mesh) -> Params:
    """Gather a (possibly cross-process sharded) pytree to host numpy on
    EVERY process.

    Single-process: plain device_get. Multi-process: one jitted identity
    with fully-replicated out_shardings — XLA emits the all-gather over
    ICI/DCN — then device_get of the now fully-addressable arrays. This is
    the checkpoint-gather path (rank-0 save, the reference's DDP
    convention); sharded-per-host orbax writes are a possible later
    optimization for pod-scale trees.
    """
    import jax
    import numpy as np
    from jax.sharding import NamedSharding, PartitionSpec as P

    if process_count() == 1:
        return jax.device_get(tree)
    replicated = NamedSharding(mesh, P())

    def ident(t):
        return t

    out = jax.jit(
        ident,
        out_shardings=jax.tree_util.tree_map(lambda _: replicated, tree),
    )(tree)
    return jax.tree_util.tree_map(lambda x: np.asarray(x), out)
