"""Depth-guided bundle sampling — the paper's core — in dense TPU form.

The reference implements bundles as ragged per-sample lists produced on the
GPU (/root/reference/networks/gdb_nerf/bundle_sampler.py): every b×b block of
rays becomes one "bundle", samples are placed inside the per-bundle MVS
confidence interval, and the adaptive path emits a *variable* number of
samples per bundle via boolean-mask gathers.

XLA wants static shapes, so this module keeps everything dense:
``(H, W, S)`` with S = max_num_samples and a validity mask ``sample_idx <
samples_per_bundle``.  With S in [3, 6] the padding waste is bounded and the
layout vectorizes perfectly on the VPU; the fixed-count (non-adaptive) path
is simply the mask-all-valid special case, matching the reference's
`_sample_along_depth` semantics exactly.

All functions are per-batch-element; vmap over batch at call sites.
"""

from __future__ import annotations

import os
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from gdb_nerf_tpu.ops import camera
from gdb_nerf_tpu.ops.loops import unrolled_vmap
from gdb_nerf_tpu.ops.grid_sample import (
    gather_patch_bilinear,
    gather_patch_bilinear_flat,
    grid_sample_3d_packed,
    GATHER_ROW_CLIFF,
    pack_bilinear_2d,
    pack_bilinear_2d_paired,
    pack_patch_2d,
    pack_patch_2d_slices,
    pack_trilinear_3d,
    sample_2d_packed_pix,
    sample_2d_paired_pix,
)
from gdb_nerf_tpu.ops import mip as _mip
from gdb_nerf_tpu.ops.mip import mip_texture_fetch_packed


class RayBundle(NamedTuple):
    """Per-target-view ray geometry grouped into b×b bundles.

    Member-ray directions are stored factored as mean + image-constant
    offsets instead of a dense (H, W, b*b, 3) tensor: rays_d = M @ [x,y,1]
    is linear in the pixel coordinate (camera.build_rays), so every
    bundle's members sit at the same direction offsets from its mean — the
    dense tensor carried no information beyond (bundle_d, member_off), and
    its (b*b, 3) minor dims tile-padded ~40x in HBM (round-4 HLO audit).
    Member k's direction = bundle_d + member_off[k], k = i*b + j.
    """

    rays_o: jax.Array  # (3,) camera center (world)
    bundle_d: jax.Array  # (H, W, 3) mean member direction (unnormalized)
    member_off: jax.Array  # (b*b, 3) image-constant member dir offsets
    uv: jax.Array  # (H, W, 2) normalized bundle-center pixel coords [-1, 1]
    cos: jax.Array  # (H, W) cos(bundle axis, camera z-axis)
    disk_radius: jax.Array  # () bundle disk radius on the z=1 plane
    near: jax.Array  # () scene near depth
    far: jax.Array  # () scene far depth


class BundleSamples(NamedTuple):
    """Dense samples along bundles. N = H*W bundles, S = max samples."""

    z_vals: jax.Array  # (H, W, S) sample depth (or disparity) at bin midpoints
    z_metric: jax.Array  # (H, W, S) metric depth of samples
    valid: jax.Array  # (H, W, S) bool validity mask
    uvd: jax.Array  # (H, W, S, 3) normalized volume coords of sphere centers
    ball_radii: jax.Array  # (H, W, S) sphere radii of samples
    samples_per_bundle: jax.Array  # (H, W) number of valid samples


def make_ray_bundles(
    tar_ext: jax.Array,
    tar_int: jax.Array,
    im_size: tuple[int, int],
    near: jax.Array,
    far: jax.Array,
    b_size: int,
) -> RayBundle:
    """Build per-pixel rays and group them into b×b bundles.

    Matches the geometry of bundle_sampler.build_rays + _assemble_bundles
    (/root/reference/networks/gdb_nerf/bundle_sampler.py:30-120): bundle
    direction = mean of member-ray directions, bundle uv = mean of member
    pixel coords, disk radius = b_size * target pixel radius.
    """
    H_orig, W_orig = im_size
    H, W = H_orig // b_size, W_orig // b_size
    rays_o, rays_d, uv, z_axis = camera.build_rays(tar_ext, tar_int, H_orig, W_orig)

    # Bundle means via strided slices: the (H, b, W, b, ·) reshape form
    # materializes with (b, ·) minor dims that tile-pad ~40-60x in HBM
    # (round-4 HLO audit: 240 MB physical for a 3.8 MB ray reshape); the
    # b*b slices keep every buffer at friendly (H, W, ·) shapes and fuse
    # into their consumers.
    acc_d = acc_uv = None
    for i in range(b_size):
        for j in range(b_size):
            d_ij = rays_d[i::b_size, j::b_size]
            u_ij = uv[i::b_size, j::b_size]
            acc_d = d_ij if acc_d is None else acc_d + d_ij
            acc_uv = u_ij if acc_uv is None else acc_uv + u_ij
    inv = 1.0 / (b_size * b_size)
    bundle_d = acc_d * inv  # (H, W, 3)
    buv = acc_uv * inv  # (H, W, 2)

    # Image-constant member offsets from the corner bundle (rays_d is linear
    # in the pixel coordinate, so one bundle's offsets serve the image).
    member_off = (
        jnp.stack(
            [rays_d[i, j] for i in range(b_size) for j in range(b_size)]
        )
        - bundle_d[0, 0][None, :]
    )  # (b*b, 3)

    cos = jnp.sum(bundle_d * z_axis, axis=-1) / jnp.linalg.norm(bundle_d, axis=-1)
    disk_radius = b_size * camera.pixel_radius(tar_int)

    return RayBundle(
        rays_o, bundle_d, member_off, buv, cos, disk_radius, near, far
    )


def sample_bundles(
    rb: RayBundle,
    depth_range: jax.Array,
    vol_range: jax.Array,
    max_num_samples: int,
    global_num_depth: int,
    inv_depth: bool,
    is_adaptive: bool,
) -> BundleSamples:
    """Place samples inside each bundle's depth confidence interval.

    Args:
      rb: ray bundles for the target view.
      depth_range: (2, H, W) per-bundle metric-depth interval (near, far).
      vol_range: (2, H, W) metric-depth range of the cost volume hypotheses.
      max_num_samples: S, the static per-bundle sample budget.
      global_num_depth: defines min spacing = full-range / global_num_depth.
      inv_depth: march uniformly in disparity instead of depth.
      is_adaptive: shrink per-bundle sample counts to
        ceil(interval / min_spacing), clamped to [1, S].

    Returns:
      BundleSamples with dense (H, W, S) layout and validity mask.
    """
    dtype = depth_range.dtype
    H, W = depth_range.shape[1:]
    S = max_num_samples

    if inv_depth:
        depth_range = 1.0 / depth_range
        vol_range = 1.0 / vol_range
        min_interval = (1.0 / rb.near - 1.0 / rb.far) / global_num_depth
    else:
        min_interval = (rb.far - rb.near) / global_num_depth

    b_near = depth_range[0]  # (H, W)
    b_far = depth_range[1]

    if is_adaptive:
        spb = jnp.ceil(jnp.abs(b_far - b_near) / min_interval)
        spb = jnp.clip(spb, 1.0, float(S))
    else:
        spb = jnp.full((H, W), float(S), dtype=dtype)

    idx = jnp.arange(S + 1, dtype=dtype)  # (S+1,)
    t_vals = b_near[..., None] + (b_far - b_near)[..., None] / spb[..., None] * idx
    t_starts = t_vals[..., :-1]
    t_ends = t_vals[..., 1:]
    z_vals = 0.5 * (t_starts + t_ends)  # (H, W, S)
    valid = jnp.arange(S)[None, None, :] < spb[..., None]

    vol_near = vol_range[0][..., None]
    vol_far = vol_range[1][..., None]
    d = 2.0 * (z_vals - vol_near) / (vol_far - vol_near) - 1.0
    uvd = jnp.concatenate(
        [jnp.broadcast_to(rb.uv[:, :, None, :], (H, W, S, 2)), d[..., None]], axis=-1
    )

    z_metric = 1.0 / z_vals if inv_depth else z_vals

    # Cone geometry -> per-bundle unit ball radius, scaled by distance of the
    # sphere center from the camera (bundle_sampler.py:258-263).
    cos = rb.cos
    tan = jnp.sqrt(jnp.maximum(1.0 / jnp.square(cos) - 1.0, 1e-12))
    unit_radius = (
        rb.disk_radius * cos / jnp.sqrt(jnp.square(tan - rb.disk_radius) + 1.0)
    )  # (H, W)

    bundle_d_mean = rb.bundle_d  # (H, W, 3)
    # |center - origin| = z * |mean_dir| since center = o + mean_dir * z.
    distances = z_metric * jnp.linalg.norm(bundle_d_mean, axis=-1)[..., None]
    ball_radii = distances * unit_radius[..., None]  # (H, W, S)

    return BundleSamples(z_vals, z_metric, valid, uvd, ball_radii, spb)


def _fetch_vox(
    feat_volume: jax.Array,
    samples: BundleSamples,
    vox_channels: Optional[int] = None,
) -> jax.Array:
    """Voxel-aligned features for every bundle sample.

    ``feat_volume`` is (D, Hv, Wv, C), or — when ``vox_channels`` is given —
    the row-major-equivalent packed form (D, Hv, Wv*C).  The packed form is
    free here (the gather tables below are row-major reshapes of either),
    but it keeps the train-time cotangent buffer at the remat/vmap boundary
    lane-aligned: the (B, D, H, W, 8) f32 accumulation buffer padded its
    8-lane channel axis 16x (1.25 GB) and OOM'd the shipped 512x640 B=4
    recipe.

    When the cost volume's spatial grid equals the bundle grid (the shipped
    configs: vol_scales[-1] == 1/bundle_size), the uvd xy coordinates are
    *exactly* the volume texel centers — the trilinear lookup degenerates to
    a 1-D linear interpolation along depth, i.e. 2 narrow gather rows per
    sample instead of one 8C-packed row from a pack_trilinear_3d volume
    whose construction alone writes D*H*W*8C elements.  Falls back to the
    general packed trilinear path when the grids differ.
    """
    if vox_channels is not None and feat_volume.ndim == 3:
        D, Hv, WC = feat_volume.shape
        C = vox_channels
        Wv = WC // C
    else:
        D, Hv, Wv, C = feat_volume.shape
    H, W, S = samples.z_vals.shape
    if (Hv, Wv) != (H, W):
        vox_packed = pack_trilinear_3d(feat_volume.reshape(D, Hv, Wv, C))
        return grid_sample_3d_packed(
            vox_packed, samples.uvd, padding_mode="border"
        )

    d = samples.uvd[..., 2]  # (H, W, S) normalized depth coordinate
    zc = jnp.clip((d + 1.0) * D * 0.5 - 0.5, 0.0, D - 1.0)  # border semantics
    if _VOX_TENT and D > 16:
        global _vox_tent_guard_warned
        if not _vox_tent_guard_warned:
            _vox_tent_guard_warned = True
            import warnings

            warnings.warn(
                f"GDBN_VOX_TENT set but volume depth D={D} > 16: the "
                "zero-gather tent path is disabled (unrolled FMA scales in "
                "D); this run measures the baseline gather path.",
                stacklevel=2,
            )
    if _VOX_TENT and D <= 16:
        # Zero-gather form: when the grids match, every (h, w) needed is the
        # full texel raster IN ORDER — the "gather" is the identity — and all
        # S samples of a bundle share their pixel, so the whole fetch is a
        # depth-axis linear interpolation.  Tent weights over the D slices
        # (max(0, 1-|zc-d|)) reproduce floor/ceil lerp exactly (the two
        # adjacent slices get (1-w, w), all others exactly 0); an unrolled
        # D-term FMA lets XLA fuse the 10 MB volume read straight into the
        # (H, W, S, C) output with no gather rows at all (the current paired
        # path costs 2 takes x H*W*S rows on the row-rate-bound chip).
        vol = feat_volume.reshape(D, H, W, C)
        out = None
        for dd in range(D):
            wd = jnp.clip(1.0 - jnp.abs(zc - float(dd)), 0.0, 1.0)[
                ..., None
            ].astype(vol.dtype)
            term = vol[dd][:, :, None, :] * wd
            out = term if out is None else out + term
        return out
    d0 = jnp.clip(jnp.floor(zc).astype(jnp.int32), 0, D - 1)
    d1 = jnp.minimum(d0 + 1, D - 1)
    w = (zc - d0.astype(zc.dtype))[..., None].astype(feat_volume.dtype)
    if D * H * W > GATHER_ROW_CLIFF and W % 2 == 0:
        # The stage-1 volume table (D*H*W rows, e.g. 655k at DTU) sits past
        # the gather row-rate cliff; fold x-pairs into 2C rows (the x grid
        # is the static texel raster, so the parity pattern is static too).
        W2 = W // 2
        paired = feat_volume.reshape(D * H * W2, 2 * C)
        base = (jnp.arange(H)[:, None] * W2 + (jnp.arange(W)[None, :] >> 1))[
            ..., None
        ]
        odd = (jnp.arange(W) & 1).astype(feat_volume.dtype)[
            None, :, None, None
        ]  # (1, W, 1, 1) static checkerboard
        r0 = jnp.take(paired, d0 * (H * W2) + base, axis=0, mode="clip")
        r1 = jnp.take(paired, d1 * (H * W2) + base, axis=0, mode="clip")
        r0 = r0[..., :C] * (1.0 - odd) + r0[..., C:] * odd
        r1 = r1[..., :C] * (1.0 - odd) + r1[..., C:] * odd
    else:
        base = (jnp.arange(H)[:, None] * W + jnp.arange(W)[None, :])[..., None]
        flat = feat_volume.reshape(D * H * W, C)
        r0 = jnp.take(flat, d0 * (H * W) + base, axis=0, mode="clip")
        r1 = jnp.take(flat, d1 * (H * W) + base, axis=0, mode="clip")
    return r0 * (1.0 - w) + r1 * w


# Stack the per-view encode outputs with (S, C) flattened into one wide
# trailing axis (A/B: GDBN_ENC_FLAT=1).  Candidate fix for the round-4 HLO
# audit finding: the (V, H, W, S, b*b, 3)-shaped stack writes tile-pad their
# (3, 12)-class minor dims ~28-42x (ops/loops.py:57 showed 1.1 GB physical
# for 128 MB logical); a (V, H, W, S*12) slice pads only 36->128.  The
# consumer (models/network.py payload concat) unflattens back — row-major
# identical, so results are bit-exact.
_ENC_FLAT = os.environ.get("GDBN_ENC_FLAT", "0") == "1"

# Zero-gather voxel fetch (see _fetch_vox): depth-axis tent interpolation
# instead of 2 takes x H*W*S gather rows.  A/B via tools/ab_frame.py
# --flag vox_tent before changing the default.  NOTE: only active when the
# volume depth D <= 16 (the unrolled D-term FMA scales linearly in D; past
# that the gather path wins) — _fetch_vox warns once if the flag is set but
# a deeper volume forces the fallback, so A/B runs aren't misread as nulls.
_VOX_TENT = os.environ.get("GDBN_VOX_TENT", "0") == "1"
_vox_tent_guard_warned = False

# Lean shared-patch member fetch (round-5 tile-fetch model, PERF.md): one
# ps x ps patch row per (bundle, sample, view) serves all b*b member rays —
# bsq x fewer gather tile-fetches than the per-member 2x2 rows (the member
# fetch's DCE marginal is 9.0 ms ≈ its row floor).  ps*ps*3 must stay
# <= 128 lanes (one gather tile): ps=6 -> 108 lanes.  Exact whenever the
# members' bilinear footprints fit the patch (group spread <= ps-2 px in
# the source view); overflow clamps to the patch edge.  Combine is the
# unrolled slice-FMA form (gather_patch_bilinear_flat) — NOT the round-2
# einsum that lost 46 ms.  A/B: tools/ab_frame.py --flag member_patch.
_MEMBER_PATCH = int(os.environ.get("GDBN_MEMBER_PATCH", "0"))


class EncodedSamples(NamedTuple):
    """Per-sample features gathered from source views and the cost volume.

    With ``_ENC_FLAT`` the per-view tensors carry (S, C) flattened into the
    trailing axis: rgbs (V, H, W, S*b*b*3), mip_feat (V, H, W, S*F),
    ray_diff (V, H, W, S*4) — same row-major data, wide minor dim.
    """

    rgbs: jax.Array  # (V, H, W, S, b*b, 3) per-ray source RGB
    mip_feat: jax.Array  # (V, H, W, S, F) anti-aliased source features (F = feat+3)
    ray_diff: jax.Array  # (V, H, W, S, 4) direction difference + dot
    vox_feat: jax.Array  # (H, W, S, voxel_dim) cost-volume features


def encode_samples(
    rb: RayBundle,
    samples: BundleSamples,
    src_images: jax.Array,
    img_feat: jax.Array,
    packed_pyramid: jax.Array,
    pyr_offsets: jax.Array,
    feat_volume: jax.Array,
    src_exts: jax.Array,
    src_ints: jax.Array,
    max_mipmap_level: int,
    member_patch: bool = False,
    vox_channels: Optional[int] = None,
) -> EncodedSamples:
    """Sphere-based encoding of bundle samples from all source views.

    TPU-native equivalent of BundleSampler.encode
    (/root/reference/networks/gdb_nerf/bundle_sampler.py:267-371): voxel
    features via trilinear cost-volume lookup, per-ray RGB via bilinear
    image gathers, anti-aliased source features via a fractional-LOD mip
    pyramid fetch (replacing nvdiffrast), and IBRNet-style ray-difference
    features.  The reference's per-batch python loop becomes a vmap.

    Args:
      rb: ray bundles (provides rays_o and bundle geometry).
      samples: dense bundle samples.
      src_images: (V, H_orig, W_orig, 3) source images.
      img_feat: (V, Hf, Wf, F) source feature+rgb maps at bundle resolution.
      packed_pyramid: (V, T, F) mip pyramid of img_feat packed by
        ops.mip.pack_pyramid; pyr_offsets: (levels,) per-level offsets.
      feat_volume: (D, Hv, Wv, C) regularized cost volume (channels-last),
        or its packed (D, Hv, Wv*C) row-major-equivalent form when
        ``vox_channels`` is set (see _fetch_vox — keeps the train-time
        cotangent buffer lane-aligned).
      src_exts: (V, 4, 4), src_ints: (V, 3, 3) at original image resolution.
      max_mipmap_level: highest mip level to use.
      member_patch: fetch all b*b member-ray RGBs from ONE shared 4x4 patch
        gather row per (bundle, sample, view) instead of one 2x2 row per
        member ray — b*b x fewer gather rows on the row-rate-bound hot path;
        exact whenever the members' footprints fit the patch (they are ~1 px
        apart in the source view; overflow clamps to the patch edge).

    Returns:
      EncodedSamples.
    """
    V = src_images.shape[0]
    H, W, S = samples.z_vals.shape
    bsq = rb.member_off.shape[0]
    b_size = int(round(bsq**0.5))
    Hf, Wf = img_feat.shape[1:3]

    vox_feat = _fetch_vox(feat_volume, samples, vox_channels)

    # Bundle-center geometry.  Member-ray positions are never materialized:
    # since member k's direction is d_mean + off_k with a pixel-space offset
    # that is linear in the ray-building matmul, its projection into any
    # view is exactly ``proj(center) + (K R off_k) * z`` — an affine
    # correction applied in image space (saves the (H, W, S, b^2, 3)
    # world-point tensors and two full-size geometry matmuls per view).
    # The offsets are image-constant and carried on the RayBundle directly.
    bundle_d_mean = rb.bundle_d  # (H, W, 3)
    d_off = rb.member_off  # (bsq, 3)
    z = samples.z_metric  # (H, W, S)
    bundle_xyz = (
        rb.rays_o + bundle_d_mean[:, :, None, :] * z[..., None]
    )  # (H, W, S, 3) sphere centers (world)

    src_cam_xyz = jax.vmap(lambda e: camera.invert_extrinsics(e)[:3, 3])(src_exts)

    # Source intrinsics at bundle-feature resolution; pixel radius there.
    scale = jnp.array(
        [[1.0 / b_size], [1.0 / b_size], [1.0]], dtype=src_ints.dtype
    )  # (3,1) row scaling
    src_ints_scaled = src_ints * scale[None]
    src_pix_radius = jax.vmap(camera.pixel_radius)(src_ints_scaled)  # (V,)

    def l2norm(x):
        return x / jnp.maximum(jnp.linalg.norm(x, axis=-1, keepdims=True), 1e-12)

    # tar_diff = normalize(bundle_xyz - rays_o) = normalize(d_mean * z) =
    # normalize(d_mean): sample-independent, so it collapses from
    # (H, W, S, 3) to (H, W, 3).
    tar_diff = l2norm(bundle_d_mean)[:, :, None, :]  # (H, W, 1, 3)

    def per_view(src_img, packed, ext, K, K_scaled, cam_xyz, pix_r):
        R, t = ext[:3, :3], ext[:3, 3]
        # Sphere centers in source camera coords: base + (R d_mean) * z.
        cam0 = camera.mm(rb.rays_o, R.T) + t  # (3,)
        Rd = camera.mm(bundle_d_mean, R.T)  # (H, W, 3)
        ccenter = cam0 + Rd[:, :, None, :] * z[..., None]  # (H, W, S, 3)

        # Member projections in full-res image space: affine in the member
        # offset.  img_k = K ccenter + (K R off_k) * z.
        img_c = camera.mm(ccenter, K.T)  # (H, W, S, 3)
        KRoff = camera.mm(d_off, camera.mm(K, R).T)  # (bsq, 3)
        img = (
            img_c[:, :, :, None, :] + KRoff * z[..., None, None]
        )  # (H, W, S, bsq, 3)
        zc = jnp.maximum(img[..., 2], 1e-6)
        # index-space coords = pixel coords - 0.5 (align_corners=False).
        cx = img[..., 0] / zc - 0.5
        cy = img[..., 1] / zc - 0.5
        if _MEMBER_PATCH:
            flat = gather_patch_bilinear_flat(
                src_img, jnp.stack([cx, cy], axis=-1), ps=_MEMBER_PATCH
            )  # (H, W, S, bsq*3)
            rgbs = flat.reshape(H, W, S, bsq, 3)
        elif member_patch:
            rgbs = gather_patch_bilinear(
                src_img, jnp.stack([cx, cy], axis=-1), ps=4
            )  # (H, W, S, bsq, 3)
        elif paired:
            rgbs = sample_2d_paired_pix(
                src_img, cx, cy, padding_mode="border"
            )  # (H, W, S, bsq, 3)
        else:
            rgbs = sample_2d_packed_pix(
                src_img, cx, cy, padding_mode="border"
            )  # (H, W, S, bsq, 3)

        # Sphere projection radius -> fractional mip level.  ``dist`` is also
        # |bundle_xyz - cam_xyz| (rigid transforms preserve norms), so it is
        # reused to normalize src_diff below.
        dist = jnp.linalg.norm(ccenter, axis=-1)

        cimg = camera.mm(ccenter, K_scaled.T)
        zc2 = jnp.maximum(cimg[..., 2], 1e-6)
        u = (cimg[..., 0] / zc2) / Wf
        v = (cimg[..., 1] / zc2) / Hf
        if _mip._L0:
            # Static level-0 single-tap fetch (see ops/mip.py::_L0 for the
            # exactness contract): the whole LOD chain below is skipped —
            # and samples.ball_radii loses its only consumer, so its
            # producer in the sampler is DCE'd too.
            mip_feat = _mip.mip_texture_fetch_l0(
                packed, (Hf, Wf), jnp.stack([u, v], axis=-1)
            )  # (H, W, S, F)
        else:
            sec_sq = jnp.square(dist / ccenter[..., 2])
            ratio = jnp.square(dist / samples.ball_radii) - 1.0
            proj_radii = sec_sq / (
                jnp.sqrt(jnp.maximum(ratio, 1e-12))
                + jnp.sqrt(jnp.maximum(sec_sq - 1.0, 1e-12))
            )
            lod = jnp.log2(proj_radii / pix_r)  # (H, W, S)

            if _mip._01:
                # Static level-(0,1) two-tap fetch (ops/mip.py::_01):
                # exact for lod < 1; the dynamic level arithmetic is dead
                # and the table only carries levels 0..1.
                mip_feat = _mip.mip_texture_fetch_01(
                    packed, (Hf, Wf), jnp.stack([u, v], axis=-1), lod
                )  # (H, W, S, F)
            else:
                # _mip._PAIR read at trace time (tools/ab_frame.py --flag
                # mip_pair flips it between traces); the table layout must
                # match — the network's pack site reads the same flag.
                fetch = (
                    _mip.mip_texture_fetch_pair
                    if _mip._PAIR
                    else mip_texture_fetch_packed
                )
                mip_feat = fetch(
                    packed,
                    pyr_offsets,
                    (Hf, Wf),
                    jnp.stack([u, v], axis=-1),
                    lod,
                    max_mipmap_level,
                )  # (H, W, S, F)

        # Ray difference features.  (direction keeps its own norm rather
        # than the algebraic sqrt(2 - 2 dot): near-parallel target/source
        # rays cancel catastrophically through dot.)
        src_diff = (bundle_xyz - cam_xyz) / jnp.maximum(dist, 1e-12)[..., None]
        direction = l2norm(tar_diff - src_diff)
        dot = jnp.sum(tar_diff * src_diff, axis=-1, keepdims=True)
        ray_diff = jnp.concatenate([direction, dot], axis=-1)  # (H, W, S, 4)

        if _ENC_FLAT:
            return (
                rgbs.reshape(H, W, S * bsq * 3),
                mip_feat.reshape(H, W, S * mip_feat.shape[-1]),
                ray_diff.reshape(H, W, S * 4),
            )
        return rgbs, mip_feat, ray_diff

    # Past the measured TPU gather row-rate cliff (~460k rows the rate
    # halves; tools/microbench_gather_cliff.py) fold x-anchor pairs into
    # double-width rows: LLFF 640x960 and NeRF 800x800 sources sit past the
    # cliff and recover the full ~300 M rows/s rate this way (1.8x measured
    # end-to-end); DTU 512x640 (327k rows) stays on the flat layout.
    H_src, W_src = src_images.shape[-3:-1]
    paired = (
        not member_patch
        and not _MEMBER_PATCH
        and H_src * W_src > GATHER_ROW_CLIFF
        and W_src % 2 == 0
    )
    if _MEMBER_PATCH:
        src_packed = pack_patch_2d_slices(src_images, _MEMBER_PATCH)
    elif member_patch:
        src_packed = pack_patch_2d(src_images, 4)  # (V, H, W, 48)
    elif paired:
        src_packed = pack_bilinear_2d_paired(src_images)  # (V, H, W/2, 24)
    else:
        src_packed = pack_bilinear_2d(src_images)  # (V, H, W, 12)
    # Unrolled loop over views instead of vmap — the same fusion win as
    # build_cost_volume: per-view coordinate/interp chains fuse
    # independently instead of through batched intermediates (V is 2-4 in
    # every shipped config).
    rgbs, mip_feat, ray_diff = unrolled_vmap(per_view, (0,) * 7)(
        src_packed,
        packed_pyramid,
        src_exts,
        src_ints,
        src_ints_scaled,
        src_cam_xyz,
        src_pix_radius,
    )

    return EncodedSamples(rgbs, mip_feat, ray_diff, vox_feat)
