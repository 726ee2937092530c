"""GDB-NeRF-TPU: a TPU-native (JAX/XLA/Pallas) generalizable NeRF framework.

A from-scratch rebuild of the capabilities of KLMAV-CUC/GDB-NeRF
("Depth-Guided Bundle Sampling for Efficient Generalizable Neural Radiance
Field Reconstruction", CVPR 2025): a feed-forward NeRF that renders a novel
view from 2-4 posed source images in a single forward pass.

Design principles (TPU-first, not a port):
  * Every compute-path function is pure and jit-able: static shapes, dense
    ``(bundles, samples)`` layouts with validity masks instead of the
    reference's ragged CUDA-side sample lists.
  * Channels-last (NHWC / NDHWC) conv layouts, bf16-friendly.
  * The nvdiffrast mip texture and nerfacc ray compositing dependencies are
    replaced by pure-JAX/Pallas equivalents (``ops.mip``, ``ops.render``).
  * Multi-device scaling via ``jax.sharding.Mesh`` + collectives, not NCCL.
"""

__version__ = "0.1.0"
