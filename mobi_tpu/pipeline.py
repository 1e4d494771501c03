"""The end-to-end inpainting pipeline, single-device or dp-sharded.

One definition of the reference's inference loop
(/root/reference/scripts/inference_test_bench.py:407-461: conditioning
encode -> VAE encodes -> CFG-doubled denoising loop -> VAE decodes) shared
by bench.py, scripts/inference_test_bench.py, and tests.

The reference samples on exactly one GPU; here the same jitted program can
run dp-sharded over a `jax.sharding.Mesh` of N chips: parameters are
replicated, the (camera, lidar)-pair batch axis is sharded whole-pairs-per-
device (mesh.shard_batch), and the CFG concat's doubled batch keeps whole
pairs per shard because every shard's sub-batch doubles locally. XLA inserts
the (cheap, ICI-riding) collective-permutes for the concat/split; everything
else is embarrassingly batch-parallel.
"""
from __future__ import annotations

from typing import Any, Dict, Optional

import jax

Params = Any


def make_inpaint_pipeline(
    model,
    num_steps: int = 50,
    guidance_scale: float = 5.0,
    sampler: str = "ddim",
    eta: float = 0.0,
    encoder_interval: int = 1,
    mesh=None,
    replicate_outputs: bool = False,
):
    """jit(get_input -> sample -> decode_sample).

    mesh=None: the plain single-device program. With a mesh, feed the
    returned fn params placed via `replicate_params` and batches placed via
    `mesh.shard_batch`; outputs stay batch-sharded unless
    `replicate_outputs` (multi-process callers that fetch on rank 0 need
    them replicated).
    """

    def pipeline(params, batch: Dict[str, Any], rng: jax.Array):
        k1, k2 = jax.random.split(rng)
        data = model.get_input(params, batch, k1, encode_cond=True)
        latents = model.sample(
            params, data, k2, num_steps=num_steps,
            guidance_scale=guidance_scale, sampler=sampler, eta=eta,
            encoder_interval=encoder_interval,
        )
        return model.decode_sample(
            params, latents, data.get("z_lidar_full"), data.get("lidar_geom")
        )

    out_shardings = None
    if mesh is not None and replicate_outputs:
        from jax.sharding import NamedSharding, PartitionSpec as P

        out_shardings = NamedSharding(mesh, P())
    return jax.jit(pipeline, out_shardings=out_shardings)


def replicate_params(mesh, params: Params) -> Params:
    """Pin the parameter tree to every device of a dp inference mesh."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    return jax.device_put(params, NamedSharding(mesh, P()))


def inference_mesh(dp: Optional[int] = None, devices=None):
    """A dp-only mesh over the first `dp` devices (all by default)."""
    from mobi_tpu.parallel.mesh import create_mesh

    devices = list(devices if devices is not None else jax.devices())
    if dp is not None:
        devices = devices[:dp]
    return create_mesh(dp=len(devices), devices=devices)
