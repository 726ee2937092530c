"""Bilinear/trilinear grid sampling with explicit coordinate conventions.

The whole GDB-NeRF pipeline hinges on sub-pixel feature gathers (plane-sweep
warps, voxel-feature lookups, per-ray RGB fetches; see
/root/reference/networks/gdb_nerf/depth_net.py:93,378,472 and
bundle_sampler.py:323,336 for the behavior being matched).  Off-by-half-pixel
bugs here silently cost dB, so conventions are pinned down once, here:

  * Normalized coordinates in ``[-1, 1]``, `align_corners=False` semantics:
    ``pix = ((norm + 1) * size - 1) / 2`` — i.e. -1/+1 are the *outer edges*
    of the corner pixels, and pixel centers sit at half-integer offsets.
  * ``padding_mode='border'``: indices clamped to the valid range.
  * ``padding_mode='zeros'``: out-of-range taps contribute zero.

All functions are channels-last and operate on a single image/volume; batch /
view dimensions are handled with ``jax.vmap`` at call sites.  XLA lowers the
gathers to TPU dynamic-gather; the Pallas fused variants live in
``gdb_nerf_tpu.ops.pallas``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def _unnormalize(coord: jax.Array, size: int) -> jax.Array:
    """Map normalized [-1, 1] to pixel coordinates (align_corners=False)."""
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Gather pixels from (H, W, C) image at integer (iy, ix) -> (..., C)."""
    H, W, _ = img.shape
    flat = img.reshape(H * W, -1)
    idx = iy * W + ix
    return jnp.take(flat, idx, axis=0)


def grid_sample_2d(
    img: jax.Array,
    grid: jax.Array,
    padding_mode: str = "border",
) -> jax.Array:
    """Bilinear sample of a 2D image at normalized grid locations.

    Args:
      img: (H, W, C) feature map.
      grid: (..., 2) normalized coordinates; ``grid[..., 0]`` is x (width
        axis), ``grid[..., 1]`` is y (height axis), both in [-1, 1].
      padding_mode: 'border' or 'zeros'.

    Returns:
      (..., C) sampled features.
    """
    H, W, C = img.shape
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    x0c = jnp.clip(x0i, 0, W - 1)
    x1c = jnp.clip(x1i, 0, W - 1)
    y0c = jnp.clip(y0i, 0, H - 1)
    y1c = jnp.clip(y1i, 0, H - 1)

    v00 = _gather_2d(img, y0c, x0c)
    v01 = _gather_2d(img, y0c, x1c)
    v10 = _gather_2d(img, y1c, x0c)
    v11 = _gather_2d(img, y1c, x1c)

    if padding_mode == "zeros":
        in_x0 = ((x0i >= 0) & (x0i < W)).astype(img.dtype)[..., None]
        in_x1 = ((x1i >= 0) & (x1i < W)).astype(img.dtype)[..., None]
        in_y0 = ((y0i >= 0) & (y0i < H)).astype(img.dtype)[..., None]
        in_y1 = ((y1i >= 0) & (y1i < H)).astype(img.dtype)[..., None]
        v00 = v00 * (in_y0 * in_x0)
        v01 = v01 * (in_y0 * in_x1)
        v10 = v10 * (in_y1 * in_x0)
        v11 = v11 * (in_y1 * in_x1)
    elif padding_mode != "border":
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")

    wx = wx[..., None]
    wy = wy[..., None]
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def _gather_3d(vol: jax.Array, iz: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    D, H, W, _ = vol.shape
    flat = vol.reshape(D * H * W, -1)
    idx = (iz * H + iy) * W + ix
    return jnp.take(flat, idx, axis=0)


def grid_sample_3d(
    vol: jax.Array,
    grid: jax.Array,
    padding_mode: str = "border",
) -> jax.Array:
    """Trilinear sample of a 3D volume at normalized grid locations.

    Args:
      vol: (D, H, W, C) feature volume.
      grid: (..., 3) normalized coordinates; ``grid[..., 0]`` is x (width,
        i.e. W axis), ``grid[..., 1]`` is y (H axis), ``grid[..., 2]`` is z
        (depth, D axis) — the torch `grid_sample` xyz ordering the reference
        relies on for its (u, v, d) cost-volume lookups.
      padding_mode: 'border' or 'zeros'.

    Returns:
      (..., C) sampled features.
    """
    D, H, W, C = vol.shape
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)
    z = _unnormalize(grid[..., 2], D)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    wz = (z - z0)[..., None]

    x0i, y0i, z0i = (v.astype(jnp.int32) for v in (x0, y0, z0))
    x1i, y1i, z1i = x0i + 1, y0i + 1, z0i + 1

    x0c, x1c = jnp.clip(x0i, 0, W - 1), jnp.clip(x1i, 0, W - 1)
    y0c, y1c = jnp.clip(y0i, 0, H - 1), jnp.clip(y1i, 0, H - 1)
    z0c, z1c = jnp.clip(z0i, 0, D - 1), jnp.clip(z1i, 0, D - 1)

    def masked(iz, iy, ix, izr, iyr, ixr):
        v = _gather_3d(vol, iz, iy, ix)
        if padding_mode == "zeros":
            ok = (
                (izr >= 0) & (izr < D) & (iyr >= 0) & (iyr < H) & (ixr >= 0) & (ixr < W)
            ).astype(vol.dtype)[..., None]
            v = v * ok
        return v

    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")

    v000 = masked(z0c, y0c, x0c, z0i, y0i, x0i)
    v001 = masked(z0c, y0c, x1c, z0i, y0i, x1i)
    v010 = masked(z0c, y1c, x0c, z0i, y1i, x0i)
    v011 = masked(z0c, y1c, x1c, z0i, y1i, x1i)
    v100 = masked(z1c, y0c, x0c, z1i, y0i, x0i)
    v101 = masked(z1c, y0c, x1c, z1i, y0i, x1i)
    v110 = masked(z1c, y1c, x0c, z1i, y1i, x0i)
    v111 = masked(z1c, y1c, x1c, z1i, y1i, x1i)

    c00 = v000 * (1 - wx) + v001 * wx
    c01 = v010 * (1 - wx) + v011 * wx
    c10 = v100 * (1 - wx) + v101 * wx
    c11 = v110 * (1 - wx) + v111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz
