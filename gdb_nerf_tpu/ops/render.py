"""Volumetric compositing over dense masked samples — the nerfacc replacement.

The reference composites ragged per-bundle sample lists with nerfacc CUDA
kernels and then L1-normalizes the weights per bundle
(/root/reference/networks/gdb_nerf/utils.py:19-121; exact semantics are also
documented by its in-file pure-PyTorch fallback).  With the dense
``(..., S)`` layout produced by ``ops.bundles`` this collapses to a masked
exclusive cumulative product along the sample axis — a perfect fit for the
TPU VPU and trivially fusible by XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def weights_from_sigma(sigma: jax.Array, valid: jax.Array) -> jax.Array:
    """Normalized compositing weights from densities.

    alpha_i = 1 - exp(-sigma_i); T_i = prod_{j<i} (1 - alpha_j + 1e-10);
    w_i = alpha_i * T_i, then L1-normalized per ray with a 1e-6 floor —
    matching render_weight_from_density (utils.py:19-43).  Invalid samples
    get alpha = 0 so they neither absorb nor occlude.

    Args:
      sigma: (..., S) densities.
      valid: (..., S) bool validity mask.

    Returns:
      (..., S) weights summing to <= 1 per ray (==1 where any weight mass).
    """
    alpha = (1.0 - jnp.exp(-sigma)) * valid.astype(sigma.dtype)
    trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
    trans = jnp.concatenate(
        [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
    )
    weights = alpha * trans
    wsum = jnp.maximum(jnp.sum(weights, axis=-1, keepdims=True), 1e-6)
    return weights / wsum


def composite(
    weights: jax.Array,
    feat: jax.Array,
    z_vals: jax.Array,
):
    """Accumulate features, depth and opacity along the sample axis.

    Args:
      weights: (..., S) compositing weights.
      feat: (..., S, C) per-sample features.
      z_vals: (..., S) per-sample depth (or disparity — the caller handles
        the disparity-space accumulation of the reference's inv_depth mode).

    Returns:
      feat_map: (..., C), depth_map: (...,), opacity: (...,).
    """
    feat_map = jnp.sum(weights[..., None] * feat, axis=-2)
    depth_map = jnp.sum(weights * z_vals, axis=-1)
    opacity = jnp.sum(weights, axis=-1)
    return feat_map, depth_map, opacity
