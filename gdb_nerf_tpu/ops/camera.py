"""Camera geometry: rays, projections, plane-sweep projection matrices.

Conventions (matching the reference pipeline, see
/root/reference/networks/gdb_nerf/bundle_sampler.py:30-74 and
depth_net.py:453-470 for the behavior being reproduced):

  * Extrinsics are world-to-camera (w2c) 4x4 matrices; intrinsics are 3x3
    pinhole matrices in pixel units.
  * Pixel (i, j) has center (j + 0.5, i + 0.5) — rays and warps are built on
    pixel centers, consistent with align_corners=False grid sampling where
    normalized coords are ``2 * center / size - 1``.

All functions operate on a single (un-batched) camera; batch / view axes are
vmapped at call sites.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

# Geometry matmuls are tiny (K=3/4) but precision-critical: on TPU the
# default matmul precision feeds the MXU with bf16-truncated operands, which
# turns into ~0.1-pixel projection errors that silently cost dB.  All camera
# math therefore requests full fp32 accumulation explicitly.
F32 = jax.lax.Precision.HIGHEST


def mm(a: jax.Array, b: jax.Array) -> jax.Array:
    """Full-precision matmul for small geometry matrices."""
    return jnp.matmul(a, b, precision=F32)


def invert_extrinsics(ext: jax.Array) -> jax.Array:
    """Invert a rigid w2c 4x4 into c2w using the closed form [R^T | -R^T t]."""
    R = ext[:3, :3]
    t = ext[:3, 3]
    Rt = R.T
    top = jnp.concatenate([Rt, (-mm(Rt, t))[:, None]], axis=1)
    bottom = jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=ext.dtype)
    return jnp.concatenate([top, bottom], axis=0)


def invert_intrinsics(K: jax.Array) -> jax.Array:
    """Closed-form inverse of an upper-triangular pinhole intrinsic matrix."""
    fx, fy = K[0, 0], K[1, 1]
    cx, cy = K[0, 2], K[1, 2]
    s = K[0, 1]
    inv = jnp.array(
        [
            [1.0, 0.0, 0.0],
            [0.0, 1.0, 0.0],
            [0.0, 0.0, 1.0],
        ],
        dtype=K.dtype,
    )
    inv = inv.at[0, 0].set(1.0 / fx)
    inv = inv.at[1, 1].set(1.0 / fy)
    inv = inv.at[0, 1].set(-s / (fx * fy))
    inv = inv.at[0, 2].set((s * cy - cx * fy) / (fx * fy))
    inv = inv.at[1, 2].set(-cy / fy)
    return inv


def pixel_centers(H: int, W: int, dtype=jnp.float32):
    """Return (H, W) meshgrids of pixel-center x and y coordinates."""
    x = jnp.arange(W, dtype=dtype) + 0.5
    y = jnp.arange(H, dtype=dtype) + 0.5
    return jnp.meshgrid(x, y, indexing="xy")


def build_rays(tar_ext: jax.Array, tar_int: jax.Array, H: int, W: int):
    """Build world-space rays through every pixel center of the target view.

    Returns:
      rays_o: (3,) camera center in world coordinates.
      rays_d: (H, W, 3) unnormalized ray directions (z=1 in camera frame).
      uv:     (H, W, 2) normalized pixel coordinates in [-1, 1].
      z_axis: (3,) camera z-axis (viewing direction) in world coordinates.
    """
    dtype = tar_ext.dtype
    c2w = invert_extrinsics(tar_ext)
    x, y = pixel_centers(H, W, dtype)
    ones = jnp.ones_like(x)
    pix = jnp.stack([x, y, ones], axis=-1)  # (H, W, 3)
    M = mm(c2w[:3, :3], invert_intrinsics(tar_int))  # (3, 3)
    rays_d = mm(pix, M.T)  # (H, W, 3)
    rays_o = c2w[:3, 3]
    z_axis = c2w[:3, 2]
    uv = jnp.stack([2.0 * x / W - 1.0, 2.0 * y / H - 1.0], axis=-1)
    return rays_o, rays_d, uv, z_axis


def pixel_radius(K: jax.Array) -> jax.Array:
    """Radius of the disk with the same area as one pixel on the z=1 plane.

    ``1 / sqrt(fx * fy * pi)`` — the footprint measure the bundle sampler
    uses to convert cone geometry into mip levels.
    """
    return 1.0 / jnp.sqrt(K[0, 0] * K[1, 1] * jnp.pi)


def project_points(xyz: jax.Array, ext: jax.Array, K: jax.Array):
    """Project world points into a camera.

    Args:
      xyz: (..., 3) world coordinates.
      ext: (4, 4) w2c extrinsics.
      K: (3, 3) intrinsics.

    Returns:
      pix: (..., 2) pixel coordinates (divided by clamped depth).
      depth: (...,) camera-space z.
      cam_xyz: (..., 3) camera-space coordinates.
    """
    cam = mm(xyz, ext[:3, :3].T) + ext[:3, 3]
    img = mm(cam, K.T)
    depth = img[..., 2]
    pix = img[..., :2] / jnp.maximum(depth, 1e-6)[..., None]
    return pix, depth, cam


def plane_sweep_projection(
    src_ext: jax.Array,
    src_int: jax.Array,
    tar_ext: jax.Array,
    tar_int: jax.Array,
) -> jax.Array:
    """Compose the 3x4 matrix mapping target-pixel homogeneous coords + depth
    to source-image homogeneous coords.

    With P = K_src @ E_src[:3] @ inv([[K_tar @ E_tar[:3]]; [0 0 0 1]]), a
    target pixel p = (x+.5, y+.5, 1) at hypothesis depth d maps to
    ``P[:, :3] @ p * d + P[:, 3]`` in source homogeneous image coordinates.
    """
    src_proj = mm(src_int, src_ext[:3, :])  # (3, 4)
    tar_proj = mm(tar_int, tar_ext[:3, :])  # (3, 4)
    tar_proj4 = jnp.concatenate(
        [tar_proj, jnp.array([[0.0, 0.0, 0.0, 1.0]], dtype=tar_proj.dtype)], axis=0
    )
    return mm(src_proj, jnp.linalg.inv(tar_proj4))  # (3, 4)
