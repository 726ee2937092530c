"""Image resizing with torch-interpolate-compatible semantics.

The reference leans on ``F.interpolate`` (bilinear, align_corners=False,
no antialias; and legacy 'nearest') throughout the pipeline.  jax.image.resize
uses different (antialiased / half-pixel-nearest) conventions, so these are
implemented explicitly on top of our grid-sample primitives:

  * bilinear: dst pixel i samples src coordinate ``(i + 0.5) * scale - 0.5``
    with edge clamping — exactly torch's align_corners=False, antialias=False.
  * nearest: src index ``floor(i * in / out)`` — torch's legacy 'nearest'.

Channels-last, un-batched; vmap for batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from gdb_nerf_tpu.ops.grid_sample import grid_sample_2d


def _downscale_axis_exact(img: jax.Array, axis: int, k: int) -> jax.Array:
    """Integer-factor bilinear downscale along one axis via strided slices.

    Under align_corners=False the dst center i maps to src coord
    ``k*i + (k-1)/2``: for odd k that IS src pixel ``k*i + (k-1)//2``
    (weight 1), for even k it sits exactly between ``k*i + k//2 - 1`` and
    ``k*i + k//2`` (weights 1/2, 1/2).  Both are pure strided slices — no
    gather rows — and bit-identical to the grid_sample path (scaling by a
    power of two commutes with float rounding)."""
    if k % 2 == 1:
        start = (k - 1) // 2
        idx = [slice(None)] * img.ndim
        idx[axis] = slice(start, None, k)
        return img[tuple(idx)]
    lo, hi = [slice(None)] * img.ndim, [slice(None)] * img.ndim
    lo[axis] = slice(k // 2 - 1, None, k)
    hi[axis] = slice(k // 2, None, k)
    return (img[tuple(lo)] + img[tuple(hi)]) * img.dtype.type(0.5)


def _upscale_axis_exact(img: jax.Array, axis: int, k: int) -> jax.Array:
    """Integer-factor bilinear upscale along one axis via slices + fixed
    per-phase two-tap FMAs — no gather rows, no per-pixel coordinate math.

    Under align_corners=False, dst pixel ``k*j + p`` samples src coordinate
    ``j + (p + 0.5)/k - 0.5``: the fractional part is the SAME for every j
    within a phase p, so each phase is one edge-clamped shifted slice pair
    blended with static weights, interleaved back by reshape.  Border
    semantics match the grid-sample path exactly (the clipped coordinate at
    the edges reproduces edge replication)."""

    def shift(t, d):
        # out[j] = t[clamp(j + d)] along axis, d in {-1, 0, 1}.
        if d == 0:
            return t
        idx = [slice(None)] * t.ndim
        edge = [slice(None)] * t.ndim
        if d > 0:
            idx[axis] = slice(d, None)
            edge[axis] = slice(-1, None)
            parts = [t[tuple(idx)], t[tuple(edge)]]
        else:
            idx[axis] = slice(None, d)
            edge[axis] = slice(None, 1)
            parts = [t[tuple(edge)], t[tuple(idx)]]
        return jnp.concatenate(parts, axis=axis)

    import math

    phases = []
    for p in range(k):
        f = (p + 0.5) / k - 0.5
        # Pure-Python phase constants: jnp ops on Python scalars inside a
        # jit trace can yield 0-d tracers on this jax build (the first CLI
        # drive failed with ConcretizationTypeError at int(jnp.floor(f))).
        b = math.floor(f)  # -1 or 0
        w = img.dtype.type(f - b)
        if w == 0.0:
            phases.append(shift(img, b))
        else:
            phases.append(
                shift(img, b) * (img.dtype.type(1.0) - w) + shift(img, b + 1) * w
            )
    stacked = jnp.stack(phases, axis=axis + 1 if axis >= 0 else img.ndim + axis + 1)
    ax = axis if axis >= 0 else img.ndim + axis
    shape = list(img.shape)
    shape[ax] = shape[ax] * k
    return stacked.reshape(shape)


def resize_bilinear(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Bilinear resize of (H, W, C) to (out_h, out_w, C)."""
    H, W, _ = img.shape
    out_h, out_w = out_hw
    if (out_h, out_w) == (H, W):
        return img
    if H % out_h == 0 and W % out_w == 0:
        # Exact integer-factor downscale: strided slices instead of the
        # 4-rows-per-pixel gather (the src_small resize alone was ~3.5 ms
        # of the DTU frame on the gather path).
        img = _downscale_axis_exact(img, img.ndim - 3, H // out_h)
        return _downscale_axis_exact(img, img.ndim - 2, W // out_w)
    if out_h % H == 0 and out_w % W == 0:
        # Exact integer-factor upscale (e.g. the (H/b, W/b) depth/opacity
        # maps back to full res): phase-static two-tap slices, zero gather
        # rows — outright work removal vs the grid path (model v3, PERF.md).
        img = _upscale_axis_exact(img, img.ndim - 3, out_h // H)
        return _upscale_axis_exact(img, img.ndim - 2, out_w // W)
    # Normalized dst pixel centers map to [-1, 1] src coords directly under
    # the align_corners=False convention.
    gx = 2.0 * (jnp.arange(out_w, dtype=img.dtype) + 0.5) / out_w - 1.0
    gy = 2.0 * (jnp.arange(out_h, dtype=img.dtype) + 0.5) / out_h - 1.0
    grid = jnp.stack(jnp.meshgrid(gx, gy, indexing="xy"), axis=-1)  # (oh, ow, 2)
    return grid_sample_2d(img, grid, padding_mode="border")


def resize_nearest(img: jax.Array, out_hw: tuple[int, int]) -> jax.Array:
    """Legacy-torch nearest resize of (H, W, C) (or (H, W)) images."""
    squeeze = img.ndim == 2
    if squeeze:
        img = img[..., None]
    H, W, _ = img.shape
    out_h, out_w = out_hw
    if (out_h, out_w) != (H, W):
        iy = jnp.floor(jnp.arange(out_h) * (H / out_h)).astype(jnp.int32)
        ix = jnp.floor(jnp.arange(out_w) * (W / out_w)).astype(jnp.int32)
        img = img[iy][:, ix]
    return img[..., 0] if squeeze else img


def upsample_nearest_2x(img: jax.Array) -> jax.Array:
    """Fast 2x nearest upsample of (H, W, C) — equals torch nearest for
    integer factors."""
    H, W, C = img.shape
    return jnp.broadcast_to(img[:, None, :, None, :], (H, 2, W, 2, C)).reshape(
        2 * H, 2 * W, C
    )


def pixel_shuffle(x: jax.Array, r: int) -> jax.Array:
    """Rearrange (H, W, C*r*r) -> (H*r, W*r, C), channel-major block order
    (matches torch.nn.functional.pixel_shuffle on NCHW tensors)."""
    H, W, Crr = x.shape
    C = Crr // (r * r)
    x = x.reshape(H, W, C, r, r)
    x = x.transpose(0, 3, 1, 4, 2)  # (H, r, W, r, C)
    return x.reshape(H * r, W * r, C)
