"""Device mesh + sharding layout for MObI training and inference.

The reference scales with PyTorch-Lightning DDP over NCCL
(/root/reference/main.py:510, scripts/train.sh). The TPU-native equivalent is
a single SPMD program over a `jax.sharding.Mesh`:

  * axis "dp"   — data parallel: the interleaved batch axis is sharded over
    dp x fsdp (gradient all-reduce is inserted by XLA and rides ICI).
  * axis "fsdp" — parameter/optimizer sharding (ZeRO-style): every parameter
    leaf is sharded along its largest dimension divisible by the fsdp axis
    size and all-gathered on use by XLA.

The camera/lidar interleave contract requires whole (camera, lidar) pairs per
shard, so the global batch must be divisible by 2 * dp * fsdp.

Multi-host: `parallel.distributed.initialize` joins the processes into one
runtime, `create_mesh` builds the global mesh from jax.devices() (all
processes' devices), and `shard_batch` assembles global batches from each
process's local slice via jax.make_array_from_process_local_data. See
tests/test_multihost.py for the 2-process loss-parity proof.
"""
from __future__ import annotations

from typing import Any, Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

Params = Any


def create_mesh(
    dp: Optional[int] = None,
    fsdp: int = 1,
    tp: int = 1,
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """dp x fsdp [x tp] mesh. The tp axis is only materialized when > 1 so
    existing two-axis programs keep their compiled signatures."""
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // (fsdp * tp)
    assert dp * fsdp * tp == n, (
        f"dp({dp}) * fsdp({fsdp}) * tp({tp}) != devices({n})"
    )
    if tp > 1:
        dev_array = np.asarray(devices).reshape(dp, fsdp, tp)
        mesh = Mesh(dev_array, axis_names=("dp", "fsdp", "tp"))
    else:
        dev_array = np.asarray(devices).reshape(dp, fsdp)
        mesh = Mesh(dev_array, axis_names=("dp", "fsdp"))
    warmup_collectives(mesh)
    return mesh


def warmup_collectives(mesh: Mesh) -> None:
    """Multi-process only: run one tiny all-reduce over the mesh's full
    device clique so the cross-process communicator (gloo on CPU, ICI/DCN
    on pods) rendezvouses NOW, while every process sits at the same
    just-built-the-mesh point. The rendezvous has a short (~30s) timeout;
    deferring it to the first real step lets a process whose step compile
    ran long (or hit the compilation cache when its peer didn't) miss it.
    The communicator is cached per device clique, so the training/inference
    collectives over this mesh reuse it."""
    if mesh_process_count(mesh) == 1:
        return
    all_axes = tuple(mesh.axis_names)
    x = _host_to_global(
        np.zeros((mesh.devices.size,), np.float32),
        NamedSharding(mesh, P(all_axes)),
    )
    out = jax.jit(
        lambda a: a.sum(), out_shardings=NamedSharding(mesh, P())
    )(x)
    jax.block_until_ready(out)


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (interleaved batch) axis over dp x fsdp; with a tp
    axis present the batch is replicated across it (tensor parallelism
    splits heads/channels, not examples)."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def batch_spec() -> P:
    return P(("dp", "fsdp"))


# Exact module leaf names whose kernels split cleanly along heads/channels
# for tensor parallelism: QKV projections and MLP in-projections shard their
# OUTPUT dim (heads/hidden split, all-reduce deferred), output projections
# and MLP out-projections shard their INPUT dim (partial sums -> psum by
# XLA). Everything else replicates over tp. Exact set membership — suffix
# fragments previously tp-sharded replicate-by-Megatron-semantics layers
# (emb_proj/bbox_proj/c_proj/...), which GSPMD keeps correct but pays
# avoidable collectives for. "proj" is the GEGLU ff in-projection
# (unet.py:71), "out" the FeedForward out-projection (unet.py:74).
_TP_COL_PARALLEL = frozenset(
    {"to_q", "to_k", "to_v", "q_proj", "k_proj", "v_proj", "fc1", "c_fc",
     "proj"}
)
_TP_ROW_PARALLEL = frozenset(
    {"to_out", "out_proj", "fc2", "c_proj", "mlp_c_proj", "out"}
)


def param_spec(
    shape: Sequence[int],
    fsdp_size: int,
    tp_size: int = 1,
    name: str = "",
) -> P:
    """ZeRO-style fsdp on the largest divisible dim, plus optional
    Megatron-style tp on attention/MLP projection kernels (name-matched)."""
    if not shape:
        return P()
    spec = [None] * len(shape)
    if tp_size > 1 and len(shape) >= 2 and name:
        # nearest named ancestor module: flax wraps the layers-module Dense
        # in an auto-named child ("to_q/Dense_0/kernel"), so scan path
        # components right-to-left for an exact set hit
        leaf = next(
            (p for p in reversed(name.split("/"))
             if p in _TP_ROW_PARALLEL or p in _TP_COL_PARALLEL),
            None,
        )
        if leaf in _TP_ROW_PARALLEL and shape[-2] % tp_size == 0:
            spec[-2] = "tp"
        elif leaf in _TP_COL_PARALLEL and shape[-1] % tp_size == 0:
            spec[-1] = "tp"
    if fsdp_size > 1:
        # Prefer the OUTPUT (last) dim, then largest-first. Sharding a
        # kernel's contracting dim makes GSPMD partition the matmul over
        # the contraction, which demands the activation's features be
        # sharded the same way — for activations carrying the dp-sharded
        # batch the partitioner then falls back to "involuntary full
        # rematerialization" (replicate-then-repartition, an all-gather
        # per step; MULTICHIP_r03 tail, bbox_proj [216, 64]). Output-dim
        # sharding stores the same bytes per device and composes with a
        # batch-sharded input without any forced reshard.
        dims = sorted(
            range(len(shape)),
            key=lambda i: (i != len(shape) - 1, -shape[i]),
        )
        for i in dims:
            if spec[i] is None and shape[i] % fsdp_size == 0 and (
                shape[i] >= fsdp_size
            ):
                spec[i] = "fsdp"
                break
    while spec and spec[-1] is None:
        spec.pop()
    return P(*spec)


def param_shardings(mesh: Mesh, params: Params) -> Params:
    fsdp_size = mesh.shape["fsdp"]
    tp_size = mesh.shape.get("tp", 1)
    flat, treedef = jax.tree_util.tree_flatten_with_path(params)
    out = [
        NamedSharding(
            mesh,
            param_spec(
                p.shape, fsdp_size, tp_size,
                "/".join(str(getattr(k, "key", k)) for k in path),
            ),
        )
        for path, p in flat
    ]
    return jax.tree_util.tree_unflatten(treedef, out)


def shard_params(mesh: Mesh, params: Params) -> Params:
    shardings = param_shardings(mesh, params)
    if mesh_process_count(mesh) == 1:
        return jax.device_put(params, shardings)
    # Multi-process: every process holds the SAME host tree (deterministic
    # init / checkpoint restore), so each one materializes just its
    # addressable shards. device_put would instead run a hidden
    # multihost_utils.assert_equal collective PER LEAF — thousands of gloo
    # ops racing the other processes' startup (measured: 30s rendezvous
    # timeouts on a loaded host). make_array_from_callback runs none.
    return jax.tree_util.tree_map(
        lambda x, s: _host_to_global(x, s), params, shardings
    )


def _host_to_global(x, sharding: NamedSharding):
    """Place a host value identical on all processes onto a (possibly
    cross-process) sharding without any collective."""
    arr = np.asarray(x)
    return jax.make_array_from_callback(
        arr.shape, sharding, lambda idx: arr[idx]
    )


def mesh_process_count(mesh: Mesh) -> int:
    """Number of distinct processes whose devices participate in the mesh."""
    return len({d.process_index for d in mesh.devices.flat})


def shard_batch(mesh: Mesh, batch: Any, interleaved: bool = False) -> Any:
    """Shard every batch-like leaf's leading axis over dp x fsdp (replicating
    anything that doesn't divide; tp always replicates the batch).

    `interleaved=False` (default) is for per-modality trees whose leading
    axis counts (camera, lidar) PAIRS — sharding camera and lidar leaves
    identically keeps whole pairs per shard by construction.

    `interleaved=True` declares the leading axis camera/lidar-interleaved
    (2 x pairs, the axis `MobiDiffusion.interleave` produces): such a leaf
    must divide 2 * dp * fsdp so each shard holds whole pairs — an
    odd-per-device split would make the cross-modal reshape
    (unet.py:110-111) span shards, which XLA keeps correct but pays a
    collective per transformer block for. Raises instead of silently
    sharding.

    Multi-process meshes (jax multi-controller over a pod or localhost
    gloo): the leaves passed in are each process's LOCAL contiguous slice
    of the global batch, in process order — the layout `PrefetchLoader`'s
    shard args produce — and the returned leaves are GLOBAL arrays built
    with `jax.make_array_from_process_local_data` (global leading axis =
    local * num_processes). Non-divisible leaves raise: cross-process
    replication of per-host data would silently use rank-0's values.
    """
    n_shards = mesh.shape["dp"] * mesh.shape["fsdp"]
    sharding = batch_sharding(mesh)
    replicated = NamedSharding(mesh, P())
    nproc = mesh_process_count(mesh)

    def put(x):
        if not (hasattr(x, "shape") and x.ndim >= 1):
            # scalars etc. are identical on every process — collective-free
            # placement (see shard_params)
            if nproc > 1:
                return _host_to_global(x, replicated)
            return jax.device_put(x, replicated)
        b = x.shape[0] * nproc  # global batch axis
        if interleaved and b % n_shards == 0 and b % (2 * n_shards) != 0:
            raise ValueError(
                f"interleaved batch axis {b} divides dp*fsdp={n_shards} but "
                f"not 2*dp*fsdp={2 * n_shards}: a (camera, lidar) pair would "
                "span shards. Use a batch of whole pairs per shard."
            )
        divisible = b % ((2 if interleaved else 1) * n_shards) == 0
        if nproc == 1:
            return jax.device_put(x, sharding if divisible else replicated)
        if not divisible:
            raise ValueError(
                f"global batch axis {b} (local {x.shape[0]} x {nproc} "
                f"processes) does not divide {'2 * ' if interleaved else ''}"
                f"dp*fsdp={n_shards}; cross-process replication of per-host "
                "data is not meaningful. Pad the local batch."
            )
        return jax.make_array_from_process_local_data(sharding, np.asarray(x))

    return jax.tree_util.tree_map(put, batch)
