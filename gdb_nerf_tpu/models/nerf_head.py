"""Per-sample NeRF MLP heads with IBRNet-style multi-view aggregation.

Two variants, matching the two MLPs of the reference:

  * ``BundleNeRF`` — the main head evaluated once per *bundle sample*
    (/root/reference/networks/gdb_nerf/nerf.py): aggregates per-view
    features, predicts density, blends the entire per-view payload
    (member-ray RGBs + mip feature + rgb) with softmax view weights, and
    appends a learned voxel-dim feature.
  * ``StageNeRF`` — the training-only tiny NeRF that supervises the
    intermediate MVS stages photometrically
    (/root/reference/networks/gdb_nerf/depth_net.py:201-298): same
    aggregation trunk but the color branch blends only per-view RGB.

TPU-bandwidth-aware design (the dev chip is ~23 GB/s memory-bound):

  * The view axis sits right after batch: inputs are ``(B, V, ..., F)`` —
    exactly the layout the encoder produces — so no multi-hundred-MB
    transposes are needed.
  * Linear layers whose torch equivalent consumes a concat of a
    *broadcast-over-views* part and a per-view part are split into two
    smaller matmuls (``W @ [shared; per_view] == W_s @ shared + W_v @
    per_view``): the shared half is computed once per sample instead of V
    times and the (V, ..., big) concat is never materialized.  The torch
    checkpoint converter splits the reference kernels row-wise to match.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


V_AXIS = 1  # (B, V, ...) everywhere in these heads


def _var_mean_unbiased(x: jax.Array, axis: int = V_AXIS):
    """torch.var_mean parity: unbiased (ddof=1) variance + mean."""
    mean = jnp.mean(x, axis=axis)
    n = x.shape[axis]
    var = jnp.sum(jnp.square(x - jnp.expand_dims(mean, axis)), axis=axis) / max(
        n - 1, 1
    )
    return var, mean


class ViewAggregator(nn.Module):
    """Shared view-direction-aware feature aggregation trunk.

    Input (B, V, ..., feat_dim+3+4) [feature, rgb, ray-diff(4)];
    output (B, ..., 16) pooled across views.
    """

    viewdir_agg: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, feat_rgb_dir: jax.Array) -> jax.Array:
        img_feat_rgb = feat_rgb_dir[..., :-4]
        if self.viewdir_agg:
            view_feat = nn.relu(
                nn.Dense(img_feat_rgb.shape[-1], dtype=self.dtype, name="view_fc")(
                    feat_rgb_dir[..., -4:]
                )
            )
            img_feat_rgb = img_feat_rgb + view_feat

        var, mean = _var_mean_unbiased(img_feat_rgb)
        # Split matmul of cat([per-view, var, mean]): the var/mean half is
        # shared across views and computed once.
        pv = nn.Dense(32, use_bias=False, dtype=self.dtype, name="global_fc_pv")(
            img_feat_rgb
        )
        shared = nn.Dense(32, use_bias=False, dtype=self.dtype, name="global_fc_var")(
            var
        ) + nn.Dense(32, dtype=self.dtype, name="global_fc_mean")(mean)
        global_feat = nn.relu(pv + jnp.expand_dims(shared, V_AXIS))  # (B, V, ..., 32)
        w = nn.relu(nn.Dense(1, dtype=self.dtype, name="agg_w_fc")(global_feat))
        w = nn.softmax(w, axis=V_AXIS)
        pooled = jnp.sum(global_feat * w, axis=V_AXIS)  # (B, ..., 32)
        return nn.relu(nn.Dense(16, dtype=self.dtype, name="fc")(pooled))


class BundleNeRF(nn.Module):
    """Density + payload-blending head for bundle samples."""

    hid_dim: int = 64
    voxel_dim: int = 8
    viewdir_agg: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        vox_feat: jax.Array,
        payload: jax.Array,
        feat_rgb_dir: jax.Array,
    ):
        """Args:
          vox_feat: (..., voxel_dim) cost-volume features.
          payload: (V, ..., P) per-view blendable payload
            (member-ray RGBs ++ mip feature ++ rgb).
          feat_rgb_dir: (V, ..., feat_dim+3+4) aggregation input (the mip
            feature ++ rgb ++ ray-diff slice of the encoding).

        Returns:
          sigma: (...,) density (float32).
          feat: (..., P + voxel_dim) blended payload ++ learned feature.
        """
        vox_feat = vox_feat.astype(self.dtype)
        payload = payload.astype(self.dtype)
        feat_rgb_dir = feat_rgb_dir.astype(self.dtype)

        img_feat = ViewAggregator(self.viewdir_agg, self.dtype, name="agg")(
            feat_rgb_dir
        )
        vox_img = jnp.concatenate([vox_feat, img_feat], axis=-1)
        x = nn.relu(nn.Dense(self.hid_dim, dtype=self.dtype, name="lr0")(vox_img))
        sigma = nn.softplus(
            nn.Dense(1, dtype=jnp.float32, name="sigma")(x.astype(jnp.float32))
        )[..., 0]

        # weight head input is cat([x, vox_img] (shared), frd (per-view)):
        # split the first matmul so the shared half runs once per sample.
        shared = nn.Dense(self.hid_dim, dtype=self.dtype, name="weight0_shared")(
            jnp.concatenate([x, vox_img], axis=-1)
        )
        pv = nn.Dense(
            self.hid_dim, use_bias=False, dtype=self.dtype, name="weight0_view"
        )(feat_rgb_dir)
        w = nn.relu(jnp.expand_dims(shared, V_AXIS) + pv)  # (B, V, ..., hid)
        w = nn.relu(nn.Dense(1, dtype=self.dtype, name="weight1")(w))
        w = nn.softmax(w.astype(jnp.float32), axis=V_AXIS).astype(self.dtype)
        blended = jnp.sum(payload * w, axis=V_AXIS)  # (B, ..., P)

        extra = nn.relu(nn.Dense(self.voxel_dim, dtype=self.dtype, name="feat_head")(x))
        feat = jnp.concatenate([blended, extra], axis=-1)
        return sigma.astype(jnp.float32), feat


class StageNeRF(nn.Module):
    """Training-only RGB head used to supervise intermediate MVS stages."""

    hid_dim: int = 64
    viewdir_agg: bool = True
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, vox_feat: jax.Array, img_feat_rgb_dir: jax.Array):
        """Args:
          vox_feat: (..., voxel_dim).
          img_feat_rgb_dir: (V, ..., feat_dim+3+4).

        Returns:
          sigma: (...,), rgb: (..., 3) — both float32.
        """
        vox_feat = vox_feat.astype(self.dtype)
        img_feat_rgb_dir = img_feat_rgb_dir.astype(self.dtype)

        img_feat = ViewAggregator(self.viewdir_agg, self.dtype, name="agg")(
            img_feat_rgb_dir
        )
        vox_img = jnp.concatenate([vox_feat, img_feat], axis=-1)
        x = nn.relu(nn.Dense(self.hid_dim, dtype=self.dtype, name="lr0")(vox_img))
        sigma = nn.softplus(
            nn.Dense(1, dtype=jnp.float32, name="sigma")(x.astype(jnp.float32))
        )[..., 0]

        shared = nn.Dense(self.hid_dim, dtype=self.dtype, name="color0_shared")(
            jnp.concatenate([x, vox_img], axis=-1)
        )
        pv = nn.Dense(
            self.hid_dim, use_bias=False, dtype=self.dtype, name="color0_view"
        )(img_feat_rgb_dir)
        w = nn.relu(jnp.expand_dims(shared, V_AXIS) + pv)
        w = nn.relu(nn.Dense(1, dtype=self.dtype, name="color1")(w))
        w = nn.softmax(w.astype(jnp.float32), axis=V_AXIS)
        rgb = jnp.sum(
            img_feat_rgb_dir[..., -7:-4].astype(jnp.float32) * w, axis=V_AXIS
        )
        return sigma, rgb
