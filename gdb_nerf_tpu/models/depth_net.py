"""Cascaded plane-sweep MVS depth estimation (the CasMVSNet analog).

Capability-equivalent of the reference DepthNet
(/root/reference/networks/gdb_nerf/depth_net.py): per stage it builds a
variance cost volume over depth/disparity hypotheses, regularizes it with a
3D U-Net, regresses depth + a confidence interval, and upsamples the CI to
seed the next stage.  During training, every intermediate stage renders a
full low-res RGB image with a tiny NeRF (``StageNeRF``) so that depth is
supervised photometrically.

Interface conventions (differences from the reference, deliberate):
  * All ``vol_range`` values exchanged between components are *metric*
    depth [near, far]; disparity conversion happens inside the consumers.
    (The reference passes raw hypothesis values, which mixes metric and
    disparity spaces in the stage-NeRF volume lookup at depth_net.py:79-87;
    we use the dimensionally consistent form.)
  * Dense (B, H, W, S) sample layout, channels-last, vmap over batch.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdb_nerf_tpu.models.cost_reg_net import CostRegNet, CostRegNetSmall
from gdb_nerf_tpu.models.nerf_head import StageNeRF
from gdb_nerf_tpu.ops import camera, cost_volume
from gdb_nerf_tpu.ops.loops import unrolled_vmap
from gdb_nerf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from gdb_nerf_tpu.ops.resize import resize_bilinear


def _scale_intrinsics(K: jax.Array, s: float) -> jax.Array:
    """Scale the first two rows of (..., 3, 3) intrinsics by s."""
    scale = jnp.array([s, s, 1.0], dtype=K.dtype)[:, None]
    return K * scale


def _stage_sample_features(
    feat_volume: jax.Array,
    img_feat_rgb: jax.Array,
    world_xyz: jax.Array,
    uvd: jax.Array,
    src_exts: jax.Array,
    src_ints_stage: jax.Array,
    tar_ext: jax.Array,
):
    """Gather per-sample voxel + per-view image features for the stage NeRF.

    Per batch element.  Equivalent to the reference's cost-volume
    grid_sample + get_img_feat_vectorized (depth_net.py:92-95, 344-396).

    Args:
      feat_volume: (D, Hv, Wv, C) regularized volume.
      img_feat_rgb: (V, Hf, Wf, F) per-view feature ++ rgb maps.
      world_xyz: (num_rays, S, 3) sample positions.
      uvd: (num_rays, S, 3) normalized volume coords.
      src_exts: (V, 4, 4), src_ints_stage: (V, 3, 3) at feature resolution.
      tar_ext: (4, 4).

    Returns:
      vox_feat: (num_rays, S, C); img_feat_rgb_dir: (num_rays, S, V, F+4).
    """
    Hf, Wf = img_feat_rgb.shape[1:3]
    vox_feat = grid_sample_3d(feat_volume, uvd, padding_mode="border")

    tar_cam = camera.invert_extrinsics(tar_ext)[:3, 3]

    def per_view(feat_map, ext, K):
        pix, depth, _ = camera.project_points(world_xyz, ext, K)
        gx = 2.0 * pix[..., 0] / Wf - 1.0
        gy = 2.0 * pix[..., 1] / Hf - 1.0
        # Behind-camera samples get pushed far outside (border-clamped),
        # matching the reference's grid[invalid] = -99 (depth_net.py:372).
        bad = depth < 1e-8
        gx = jnp.where(bad, -99.0, gx)
        gy = jnp.where(bad, -99.0, gy)
        feats = grid_sample_2d(
            feat_map, jnp.stack([gx, gy], axis=-1), padding_mode="border"
        )
        cam_xyz = camera.invert_extrinsics(ext)[:3, 3]

        def l2norm(v):
            return v / jnp.maximum(jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-12)

        tar_diff = l2norm(world_xyz - tar_cam)
        src_diff = l2norm(world_xyz - cam_xyz)
        direction = l2norm(tar_diff - src_diff)
        dot = jnp.sum(tar_diff * src_diff, axis=-1, keepdims=True)
        return jnp.concatenate([feats, direction, dot], axis=-1)

    per_view_feats = unrolled_vmap(per_view, (0, 0, 0))(
        img_feat_rgb, src_exts, src_ints_stage
    )
    # (V, num_rays, S, F+4); the stage NeRF takes the view axis after batch.
    return vox_feat, per_view_feats


class DepthNet(nn.Module):
    base_channels: int = 8
    vol_levels: Sequence[int] = (0, 1)
    vol_scales: Sequence[float] = (0.125, 0.5)
    feat_scales: Sequence[float] = (0.25, 0.5)  # fpn scale at each used level
    feat_dims: Sequence[int] = (32, 16)  # fpn feature dim at each used level
    ci_scales: Sequence[float] = (1.0, 1.0)
    voxel_dim: int = 8
    num_depth: Sequence[int] = (64, 8)
    inv_depth: Sequence[bool] = (True, False)
    # Training-only stage NeRFs:
    num_samples: Sequence[int] = (8,)
    nerf_hidden_dims: int = 64
    viewdir_agg: bool = True
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        src_images: jax.Array,
        ms_feats: list[jax.Array],
        src_exts: jax.Array,
        src_ints: jax.Array,
        tar_exts: jax.Array,
        tar_ints: jax.Array,
        near_far: jax.Array,
        train: bool,
    ):
        """Run the MVS cascade.

        Args:
          src_images: (B, V, H, W, 3).
          ms_feats: FPN levels [(B, V, h, w, c)] coarsest-first.
          src_exts: (B, V, 4, 4); src_ints: (B, V, 3, 3).
          tar_exts: (B, 4, 4); tar_ints: (B, 3, 3).
          near_far: (B, 2) scene depth range.
          train: enables the stage-NeRF photometric heads.

        Returns dict with per-stage lists:
          depths: (B, Hi, Wi) metric MVS depth.
          depth_ranges: (B, 2, Hi, Wi) metric CI.
          vol_ranges: (B, 2, Hi, Wi) metric hypothesis range.
          volumes: (B, D, Hi, Wi, voxel_dim) feature volumes.
          blend_rgbs: (B, Hi, Wi, 3) stage-NeRF renders (train only).
        """
        B, V, H_orig, W_orig, _ = src_images.shape
        num_stages = len(self.vol_levels)

        out = {
            "depths": [],
            "depth_ranges": [],
            "vol_ranges": [],
            "volumes": [],
            "blend_rgbs": [],
        }

        # (B, 2, h, w) metric depth range seeding each stage.
        depth_range = near_far[:, :, None, None]

        for idx in range(num_stages):
            feats = ms_feats[self.vol_levels[idx]]  # (B, V, hf, wf, c)
            src_ints_stage = _scale_intrinsics(src_ints, self.feat_scales[idx])
            tar_ints_stage = _scale_intrinsics(tar_ints, self.vol_scales[idx])
            Hi = int(H_orig * self.vol_scales[idx])
            Wi = int(W_orig * self.vol_scales[idx])
            inv = bool(self.inv_depth[idx])
            D = self.num_depth[idx]

            dr = jnp.broadcast_to(depth_range, (B, 2, Hi, Wi))
            depth_values = unrolled_vmap(
                lambda nf: cost_volume.get_depth_values(nf, D, inv), (0,)
            )(dr)  # (B, D, Hi, Wi) hypothesis values (disparity if inv)

            volume = unrolled_vmap(
                lambda f, se, si, te, ti, dv: cost_volume.build_cost_volume(
                    f, se, si, te, ti, dv, inv, sequential=train
                ),
                (0, 0, 0, 0, 0, 0),
            )(
                feats.astype(self.dtype),
                src_exts,
                src_ints_stage,
                tar_exts,
                tar_ints_stage,
                depth_values,
            )
            # (B, D, Hi, Wi, C)

            reg = (
                CostRegNetSmall(
                    self.voxel_dim, self.base_channels, self.axis_name, self.dtype
                )
                if idx == 0
                else CostRegNet(
                    self.voxel_dim, self.base_channels, self.axis_name, self.dtype
                )
            )
            feat_volume, depth_prob = reg(volume, train)

            depth, ci = unrolled_vmap(
                lambda dv, p: cost_volume.depth_regression(
                    dv, p, self.ci_scales[idx], inv
                ),
                (0, 0),
            )(depth_values, depth_prob.astype(jnp.float32))

            # Metric hypothesis range, ordered [near, far].
            first = depth_values[:, 0]
            last = depth_values[:, -1]
            if inv:
                vol_range = jnp.stack([1.0 / first, 1.0 / last], axis=1)
            else:
                vol_range = jnp.stack([first, last], axis=1)

            depth_range = ci
            out["depths"].append(depth)
            out["depth_ranges"].append(ci)
            out["vol_ranges"].append(vol_range)
            out["volumes"].append(feat_volume)

            if idx < num_stages - 1:
                if train:
                    img_feat_rgb = jnp.concatenate(
                        [
                            feats,
                            unrolled_vmap(
                                unrolled_vmap(
                                    lambda im: resize_bilinear(
                                        im, feats.shape[2:4]
                                    ),
                                    (0,),
                                ),
                                (0,),
                            )(src_images),
                        ],
                        axis=-1,
                    )  # (B, V, hf, wf, c+3)
                    rgb = self._render_stage(
                        idx,
                        feat_volume,
                        img_feat_rgb,
                        src_exts,
                        src_ints_stage,
                        tar_exts,
                        tar_ints_stage,
                        ci,
                        vol_range,
                        (Hi, Wi),
                    )
                    out["blend_rgbs"].append(rgb)

                up = self.vol_scales[idx + 1] / self.vol_scales[idx]
                new_hw = (int(Hi * up), int(Wi * up))
                depth_range = unrolled_vmap(
                    lambda d: jnp.moveaxis(
                        resize_bilinear(jnp.moveaxis(d, 0, -1), new_hw), -1, 0
                    ),
                    (0,),
                )(depth_range)

        return out

    def _render_stage(
        self,
        idx: int,
        feat_volume: jax.Array,
        img_feat_rgb: jax.Array,
        src_exts: jax.Array,
        src_ints_stage: jax.Array,
        tar_exts: jax.Array,
        tar_ints_stage: jax.Array,
        ci: jax.Array,
        vol_range: jax.Array,
        hw: tuple[int, int],
    ) -> jax.Array:
        """Render the full stage-resolution image with the stage NeRF.

        Equivalent of DepthNet._render_rays (depth_net.py:49-116): uniform
        samples inside the per-pixel CI, voxel + image feature gathers, MLP,
        and *unnormalized* alpha compositing.
        """
        Hi, Wi = hw
        S = self.num_samples[idx]
        inv = bool(self.inv_depth[idx])

        def geometry(te, ti, ci_b, vr_b):
            rays_o, rays_d, _, _ = camera.build_rays(te, ti, Hi, Wi)
            ray_near = ci_b[0].reshape(-1)  # (N,) metric
            ray_far = ci_b[1].reshape(-1)
            vol_near = vr_b[0].reshape(-1)
            vol_far = vr_b[1].reshape(-1)
            if inv:
                ray_near, ray_far = 1.0 / ray_far, 1.0 / ray_near
                vol_near, vol_far = 1.0 / vol_near, 1.0 / vol_far
            steps = jnp.linspace(0.0, 1.0, S + 1)
            t_vals = ray_near[:, None] + (ray_far - ray_near)[:, None] * steps
            z_vals = 0.5 * (t_vals[:, :-1] + t_vals[:, 1:])  # (N, S)
            d = 2.0 * (z_vals - vol_near[:, None]) / (vol_far - vol_near)[:, None] - 1.0
            x, y = camera.pixel_centers(Hi, Wi)
            u = (2.0 * x / Wi - 1.0).reshape(-1)
            v = (2.0 * y / Hi - 1.0).reshape(-1)
            uv = jnp.stack([u, v], axis=-1)  # (N, 2)
            uvd = jnp.concatenate(
                [jnp.broadcast_to(uv[:, None, :], (Hi * Wi, S, 2)), d[..., None]],
                axis=-1,
            )
            z_metric = 1.0 / z_vals if inv else z_vals
            world = (
                rays_o + rays_d.reshape(-1, 1, 3) * z_metric[..., None]
            )  # (N, S, 3)
            return world, uvd, z_vals

        world, uvd, z_vals = unrolled_vmap(geometry, (0, 0, 0, 0))(
            tar_exts, tar_ints_stage, ci, vol_range
        )
        vox_feat, img_dir = unrolled_vmap(
            _stage_sample_features, (0, 0, 0, 0, 0, 0, 0)
        )(
            feat_volume, img_feat_rgb, world, uvd, src_exts, src_ints_stage, tar_exts
        )  # (B, N, S, C), (B, N, S, V, F+4)

        sigma, rgb = StageNeRF(
            self.nerf_hidden_dims,
            self.viewdir_agg,
            dtype=self.dtype,
            name=f"stage_nerf_{idx}",
        )(vox_feat, img_dir)

        # Vanilla (unnormalized) compositing — depth_net.py:109-114.
        alpha = 1.0 - jnp.exp(-sigma)  # (B, N, S)
        trans = jnp.cumprod(1.0 - alpha + 1e-10, axis=-1)
        trans = jnp.concatenate(
            [jnp.ones_like(trans[..., :1]), trans[..., :-1]], axis=-1
        )
        weights = alpha * trans
        rgb_map = jnp.sum(weights[..., None] * rgb, axis=-2)  # (B, N, 3)
        return rgb_map.reshape(-1, Hi, Wi, 3)
