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

Multi-host would extend the same mesh over DCN via jax.distributed.initialize;
nothing in this module assumes single-host except mesh construction from
jax.devices().
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
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    if dp is None:
        dp = n // fsdp
    assert dp * fsdp == n, f"dp({dp}) * fsdp({fsdp}) != devices({n})"
    dev_array = np.asarray(devices).reshape(dp, fsdp)
    return Mesh(dev_array, axis_names=("dp", "fsdp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (interleaved batch) axis over all devices."""
    return NamedSharding(mesh, P(("dp", "fsdp")))


def batch_spec() -> P:
    return P(("dp", "fsdp"))


def param_spec(shape: Sequence[int], fsdp_size: int) -> P:
    """ZeRO-style: shard the largest divisible dim over "fsdp"."""
    if fsdp_size <= 1 or not shape:
        return P()
    dims = sorted(range(len(shape)), key=lambda i: -shape[i])
    for i in dims:
        if shape[i] % fsdp_size == 0 and shape[i] >= fsdp_size:
            spec = [None] * len(shape)
            spec[i] = "fsdp"
            return P(*spec)
    return P()


def param_shardings(mesh: Mesh, params: Params) -> Params:
    fsdp_size = mesh.shape["fsdp"]
    return jax.tree_util.tree_map(
        lambda p: NamedSharding(mesh, param_spec(p.shape, fsdp_size)), params
    )


def shard_params(mesh: Mesh, params: Params) -> Params:
    return jax.device_put(params, param_shardings(mesh, params))


def shard_batch(mesh: Mesh, batch: Any) -> Any:
    sharding = batch_sharding(mesh)
    replicated = NamedSharding(mesh, P())
    def put(x):
        # shard the leading axis when it divides evenly, else replicate
        if hasattr(x, "shape") and x.ndim >= 1 and x.shape[0] % mesh.size == 0:
            return jax.device_put(x, sharding)
        return jax.device_put(x, replicated)
    return jax.tree_util.tree_map(put, batch)
