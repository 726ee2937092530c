"""Plane-sweep cost volume construction and depth regression.

TPU-native reimplementation of the reference's cascaded-MVS math
(/root/reference/networks/gdb_nerf/depth_net.py:399-514): depth hypothesis
generation (uniform in depth or disparity), differentiable homography warping
of source features with a variance cost metric, and softmax-expectation depth
regression with a variance-derived confidence interval.

Everything here is per-batch-element and channels-last; vmap over batch at
call sites.  The warp is expressed as one big batched gather over
(views, depth, H, W) so XLA can fuse the projection arithmetic into the
gather's index computation.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Layout-propagation barrier experiment (see build_cost_volume); default on
# only after A/B measurement — flip with GDBN_CV_BARRIER=0/1.
_CV_BARRIER = os.environ.get("GDBN_CV_BARRIER", "0") == "1"

# Accumulate the variance moments in the gather-native FLAT (D*Ht*Wt, C)
# layout instead of (D, Ht, Wt, C).  Round-4 HLO audit: the downstream
# (depth-folded) CostRegNet conv demands a spatial-minor layout, and layout
# assignment propagates that demand backwards THROUGH the variance fusion to
# each view's raw 4C-packed gather output — a full transpose copy per view
# (3 x 80 MB x 2 stages = 960 MB logical per DTU frame; optimization_barrier
# does not block layout propagation, which is why GDBN_CV_BARRIER measured
# null).  In flat 2-D form every buffer between the gather and the variance
# is {1,0} row-major — nothing to transpose — and only the V-fold-smaller
# C-channel variance pays the conv-layout copy after the final bitcast
# reshape.  Exact: the reshape is row-major-identity.
_CV_FLAT = os.environ.get("GDBN_CV_FLAT", "0") == "1"

from gdb_nerf_tpu.ops import camera
from gdb_nerf_tpu.ops.grid_sample import (
    grid_sample_2d,
    grid_sample_2d_packed,
    pack_bilinear_2d,
)


def get_depth_values(near_far: jax.Array, num_depth: int, inv_depth: bool) -> jax.Array:
    """Uniform depth (or disparity) hypotheses between near and far.

    Args:
      near_far: (2, H, W) per-pixel near / far values (H=W=1 for stage 0).
      num_depth: number of hypothesis planes D.
      inv_depth: sample uniformly in disparity (1/depth) instead of depth.

    Returns:
      (D, H, W) hypothesis values, ordered near -> far.  When ``inv_depth``
      the values are *disparities* (so they decrease along D).
    """
    near = near_far[0:1]
    far = near_far[1:2]
    if inv_depth:
        near = 1.0 / near
        far = 1.0 / far
    steps = jnp.linspace(0.0, 1.0, num_depth, dtype=near.dtype)[:, None, None]
    return near + (far - near) * steps


def warp_src_to_volume(
    src_feat_packed: jax.Array,
    proj: jax.Array,
    depth_values: jax.Array,
    flat: bool = False,
) -> jax.Array:
    """Warp one (2x2-packed) source feature map onto target depth planes.

    Args:
      src_feat_packed: (Hs, Ws, 4C) source features from pack_bilinear_2d —
        packed so each warp sample costs one gather row instead of four.
      proj: (3, 4) plane-sweep projection (camera.plane_sweep_projection).
      depth_values: (D, Ht, Wt) *metric* depth per plane (already inverted if
        the hypotheses were disparities).

    Returns:
      (D, Ht, Wt, C) warped features, zero where the projection falls outside
      the source image — or (D*Ht*Wt, C) when ``flat`` (see _CV_FLAT: keeps
      every buffer between the gather and its consumer in {1,0} row-major so
      no layout-transpose copy of the 4C gather output can be inserted).
    """
    Hs, Ws = src_feat_packed.shape[:2]
    D, Ht, Wt = depth_values.shape
    x, y = camera.pixel_centers(Ht, Wt, depth_values.dtype)
    pix = jnp.stack([x, y, jnp.ones_like(x)], axis=-1)  # (Ht, Wt, 3)
    base = camera.mm(pix, proj[:, :3].T)  # (Ht, Wt, 3)
    xyz = base[None] * depth_values[..., None] + proj[:, 3]  # (D, Ht, Wt, 3)
    z = jnp.maximum(xyz[..., 2], 1e-6)
    gx = 2.0 * (xyz[..., 0] / z) / Ws - 1.0
    gy = 2.0 * (xyz[..., 1] / z) / Hs - 1.0
    grid = jnp.stack([gx, gy], axis=-1)  # (D, Ht, Wt, 2)
    if flat:
        grid = grid.reshape(D * Ht * Wt, 2)
    return grid_sample_2d_packed(src_feat_packed, grid, padding_mode="zeros")


def build_cost_volume(
    src_feats: jax.Array,
    src_exts: jax.Array,
    src_ints: jax.Array,
    tar_ext: jax.Array,
    tar_int: jax.Array,
    depth_values: jax.Array,
    inv_depth: bool,
    sequential: bool = False,
) -> jax.Array:
    """Variance-metric plane-sweep cost volume over all source views.

    Args:
      src_feats: (V, Hs, Ws, C) source feature maps.
      src_exts: (V, 4, 4) source w2c extrinsics.
      src_ints: (V, 3, 3) source intrinsics (already scaled to feature res).
      tar_ext: (4, 4) target w2c extrinsics.
      tar_int: (3, 3) target intrinsics (already scaled to volume res).
      depth_values: (D, Ht, Wt) hypothesis values (disparity if inv_depth).
      inv_depth: whether depth_values are disparities.
      sequential: accumulate views with a lax.scan whose body is
        jax.checkpoint'ed instead of the unrolled python loop.  Training
        only: under reverse-mode AD the unrolled loop keeps every view's
        packed-gather select temps alive at once inside the rematted
        backward (f32 (D, Ht, Wt, 4C) each — the 512x640 B=4 recipe OOM'd
        by 0.5 GB with ~20 such 192 MB temps); a scan's backward runs one
        iteration at a time, so the peak is one view's warp.  Eval keeps
        the unrolled form (forward-only frees temps as consumed, and the
        unrolled loop fuses better — PERF.md round-2).

    Returns:
      (D, Ht, Wt, C) per-hypothesis feature variance across views.
    """
    metric_depth = 1.0 / depth_values if inv_depth else depth_values
    V = src_feats.shape[0]
    projs = jax.vmap(
        lambda e, k: camera.plane_sweep_projection(e, k, tar_ext, tar_int)
    )(src_exts, src_ints)  # (V, 3, 4)
    packed = pack_bilinear_2d(src_feats)  # (V, Hs, Ws, 4C)
    if sequential:
        D, Ht, Wt = metric_depth.shape
        C = src_feats.shape[-1]
        zeros = jnp.zeros((D, Ht, Wt, C), jnp.float32)

        warp32 = jax.checkpoint(
            lambda p, r, md: warp_src_to_volume(p, r, md).astype(jnp.float32)
        )

        def body(carry, xs):
            s1, s2 = carry
            pk, pr = xs
            w = warp32(pk, pr, metric_depth)
            return (s1 + w, s2 + w * w), None

        (s1, s2), _ = jax.lax.scan(body, (zeros, zeros), (packed, projs))
        mean = s1 / V
        return (s2 / V - mean * mean).astype(src_feats.dtype)
    # Accumulate the two moments with an unrolled python loop over views
    # instead of vmap + mean over a materialized (V, D, Ht, Wt, C) tensor:
    # XLA then fuses each view's interpolation directly into the fp32
    # accumulators and the V-axis tensor (and its fp32 upcasts) never hits
    # HBM — measured 2-3x on both stages (tools/microbench_cv.py), bit-exact.
    # Moments stay float32 even for bf16 features: the variance drives the
    # depth softmax, where bf16 cancellation costs dB.
    s1 = s2 = None
    for v in range(V):
        w = warp_src_to_volume(
            packed[v], projs[v], metric_depth, flat=_CV_FLAT
        ).astype(jnp.float32)
        s1 = w if s1 is None else s1 + w
        s2 = w * w if s2 is None else s2 + w * w
    mean = s1 / V
    var = (s2 / V - mean * mean).astype(src_feats.dtype)
    if _CV_FLAT:
        D, Ht, Wt = metric_depth.shape
        var = var.reshape(D, Ht, Wt, src_feats.shape[-1])
    if _CV_BARRIER:
        # Stop the CostRegNet conv's layout choice from propagating
        # backwards through the variance math to the per-view gather roots:
        # without the barrier XLA inserts a full layout-transpose copy of
        # every view's PACKED 4-tap gather output (3 copies of (D,Ht,Wt,4C)
        # per stage, ~1.2 GB physical per DTU frame — HLO audit in
        # PERF.md); with it, only the V-fold-smaller combined variance pays
        # the one conv-layout copy.
        var = jax.lax.optimization_barrier(var)
    return var


def depth_regression(
    depth_values: jax.Array,
    depth_prob: jax.Array,
    ci_scale: float,
    inv_depth: bool,
):
    """Softmax-expectation depth plus a std-derived confidence interval.

    Args:
      depth_values: (D, H, W) hypothesis values (disparity if inv_depth).
      depth_prob: (D, H, W) softmax probability over hypotheses.
      ci_scale: half-width of the interval in units of the std.
      inv_depth: whether depth_values are disparities.

    Returns:
      depth: (H, W) expected *metric* depth.
      ci: (2, H, W) metric-depth confidence interval (near, far), clamped to
        the hypothesis range.
    """
    expect = jnp.sum(depth_prob * depth_values, axis=0, keepdims=True)  # (1, H, W)
    var = jnp.sum(depth_prob * jnp.square(depth_values - expect), axis=0, keepdims=True)
    std = jnp.sqrt(jnp.maximum(var, 1e-12))
    half = ci_scale * std

    if inv_depth:
        # Hypotheses are disparities: depth_values[0] is the largest
        # (nearest) disparity, depth_values[-1] the smallest.  Clamp the
        # disparity interval to the hypothesis range, then invert.
        hi = jnp.minimum(expect + half, depth_values[0:1])
        lo = jnp.maximum(expect - half, depth_values[-1:])
        ci = 1.0 / jnp.concatenate([hi, lo], axis=0)
        depth = 1.0 / expect
    else:
        lo = jnp.maximum(expect - half, depth_values[0:1])
        hi = jnp.minimum(expect + half, depth_values[-1:])
        ci = jnp.concatenate([lo, hi], axis=0)
        depth = expect
    return depth[0], ci
