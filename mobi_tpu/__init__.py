"""mobi_tpu — TPU-native (JAX/XLA/Pallas/pjit) multimodal object inpainting framework.

A from-scratch rebuild of the capabilities of MObI (alexbuburuzan/MObI:
"MObI: Multimodal Object Inpainting Using Diffusion Models", CVPR-W DDADS 2025):
joint camera-RGB + lidar range-view object inpainting with a Paint-by-Example
style latent diffusion model, conditioned on a CLIP-encoded reference crop and
a 3D bounding box.

Design stance (TPU-first, not a port):
  * models are pure functions over parameter pytrees (flax.linen),
  * sampling loops are `lax.scan`s with precomputed per-step tables,
  * camera/lidar pairing uses a static interleave contract on the batch axis
    (reference: ldm/util.py:213-221 `cat_interleave`) that never crosses a
    device shard,
  * parallelism is expressed with `jax.sharding.Mesh` + NamedSharding,
  * hot kernels (attention) have Pallas TPU implementations.
"""

__version__ = "0.1.0"
