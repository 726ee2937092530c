"""Mipmapped texture sampling — pure-JAX replacement for nvdiffrast.texture.

The reference fetches anti-aliased source features with
``nvdiffrast.torch.texture(..., mip_level_bias=levels,
boundary_mode='clamp', max_mip_level=L)``
(/root/reference/networks/gdb_nerf/bundle_sampler.py:355-359): a mip pyramid
built by 2×2 box downsampling, bilinear taps at the two adjacent levels, and
a linear blend by the fractional LOD.

This module reproduces those semantics with static shapes:

  * ``build_pyramid`` precomputes all levels with 2×2 average pooling.
  * ``mip_texture_fetch`` samples *every* level bilinearly and combines them
    with tent weights ``max(0, 1 - |lod - l|)`` — mathematically identical
    to floor/ceil trilinear filtering, but branch-free and fully vectorized
    (max_mip_level is 3, so this is 4 cheap gathers on small maps).

Texture coordinates follow the nvdiffrast convention: uv in [0, 1] with
texel centers at ``(i + 0.5) / size`` (so the sample point is
``uv * size - 0.5`` in texel units) and clamped boundaries.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def build_pyramid(img: jax.Array, max_level: int) -> list[jax.Array]:
    """Build a box-filter mip pyramid.

    Args:
      img: (..., H, W, C) base texture; H and W must be divisible by
        2**max_level.
      max_level: number of reduction levels.

    Returns:
      List of max_level+1 arrays, level 0 being ``img`` itself.
    """
    levels = [img]
    cur = img
    for _ in range(max_level):
        *lead, H, W, C = cur.shape
        cur = cur.reshape(*lead, H // 2, 2, W // 2, 2, C).mean(axis=(-4, -2))
        levels.append(cur)
    return levels


def _bilinear_clamp(tex: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear fetch with clamped boundary; uv in [0,1], texel centers at
    (i+0.5)/size."""
    H, W, C = tex.shape
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)

    flat = tex.reshape(H * W, C)
    v00 = jnp.take(flat, y0i * W + x0i, axis=0)
    v01 = jnp.take(flat, y0i * W + x1i, axis=0)
    v10 = jnp.take(flat, y1i * W + x0i, axis=0)
    v11 = jnp.take(flat, y1i * W + x1i, axis=0)
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def mip_texture_fetch(
    levels: list[jax.Array],
    uv: jax.Array,
    lod: jax.Array,
    max_level: int,
) -> jax.Array:
    """Trilinear (bilinear × mip-lerp) texture fetch at fractional LOD.

    Args:
      levels: pyramid from ``build_pyramid``; each (H_l, W_l, C).
      uv: (..., 2) coordinates in [0, 1].
      lod: (...,) fractional mip level, clamped to [0, max_level].
      max_level: highest usable level (static).

    Returns:
      (..., C) filtered texture values.
    """
    lod = jnp.clip(lod, 0.0, float(max_level))
    out = None
    for l in range(max_level + 1):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(lod - float(l)))[..., None]
        tap = _bilinear_clamp(levels[l], uv)
        out = tap * w if out is None else out + tap * w
    return out
