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

Both operate on arbitrary leading sample dims with an explicit trailing
view axis ``(..., V, F)``; all layers are Dense, so XLA maps them onto the
MXU in one batched matmul per layer.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


def _var_mean_unbiased(x: jax.Array, axis: int):
    """torch.var_mean parity: unbiased (ddof=1) variance + mean."""
    mean = jnp.mean(x, axis=axis, keepdims=True)
    n = x.shape[axis]
    var = jnp.sum(jnp.square(x - mean), axis=axis, keepdims=True) / max(n - 1, 1)
    return var, mean


class ViewAggregator(nn.Module):
    """Shared view-direction-aware feature aggregation trunk.

    Input (..., V, feat_dim+3+4) [feature, rgb, ray-diff(4)];
    output (..., 16) pooled across views.
    """

    viewdir_agg: bool = True

    @nn.compact
    def __call__(self, feat_rgb_dir: jax.Array) -> jax.Array:
        V = feat_rgb_dir.shape[-2]
        img_feat_rgb = feat_rgb_dir[..., :-4]
        if self.viewdir_agg:
            view_feat = nn.relu(
                nn.Dense(img_feat_rgb.shape[-1], name="view_fc")(
                    feat_rgb_dir[..., -4:]
                )
            )
            img_feat_rgb = img_feat_rgb + view_feat

        var, mean = _var_mean_unbiased(img_feat_rgb, axis=-2)
        var = jnp.broadcast_to(var, img_feat_rgb.shape)
        mean = jnp.broadcast_to(mean, img_feat_rgb.shape)
        feat = jnp.concatenate([img_feat_rgb, var, mean], axis=-1)
        global_feat = nn.relu(nn.Dense(32, name="global_fc")(feat))  # (..., V, 32)
        w = nn.relu(nn.Dense(1, name="agg_w_fc")(global_feat))
        w = nn.softmax(w, axis=-2)
        pooled = jnp.sum(global_feat * w, axis=-2)  # (..., 32)
        return nn.relu(nn.Dense(16, name="fc")(pooled))


class BundleNeRF(nn.Module):
    """Density + payload-blending head for bundle samples."""

    hid_dim: int = 64
    voxel_dim: int = 8
    viewdir_agg: bool = True

    @nn.compact
    def __call__(
        self,
        vox_feat: jax.Array,
        payload: jax.Array,
        feat_rgb_dir: jax.Array,
    ):
        """Args:
          vox_feat: (..., voxel_dim) cost-volume features.
          payload: (..., V, P) per-view blendable payload
            (member-ray RGBs ++ mip feature ++ rgb).
          feat_rgb_dir: (..., V, feat_dim+3+4) aggregation input (the mip
            feature ++ rgb ++ ray-diff slice of the encoding).

        Returns:
          sigma: (...,) density.
          feat: (..., P + voxel_dim) blended payload ++ learned feature.
        """
        V = feat_rgb_dir.shape[-2]
        img_feat = ViewAggregator(self.viewdir_agg, name="agg")(feat_rgb_dir)
        vox_img = jnp.concatenate([vox_feat, img_feat], axis=-1)
        x = nn.relu(nn.Dense(self.hid_dim, name="lr0")(vox_img))
        sigma = nn.softplus(nn.Dense(1, name="sigma")(x))[..., 0]

        w_feat = jnp.concatenate([x, vox_img], axis=-1)  # (..., hid+vox+16)
        w_feat = jnp.broadcast_to(
            w_feat[..., None, :], w_feat.shape[:-1] + (V, w_feat.shape[-1])
        )
        w_feat = jnp.concatenate([w_feat, feat_rgb_dir], axis=-1)
        w = nn.relu(nn.Dense(self.hid_dim, name="weight0")(w_feat))
        w = nn.relu(nn.Dense(1, name="weight1")(w))
        w = nn.softmax(w, axis=-2)  # over views
        blended = jnp.sum(payload * w, axis=-2)  # (..., P)

        extra = nn.relu(nn.Dense(self.voxel_dim, name="feat_head")(x))
        return sigma, jnp.concatenate([blended, extra], axis=-1)


class StageNeRF(nn.Module):
    """Training-only RGB head used to supervise intermediate MVS stages."""

    hid_dim: int = 64
    viewdir_agg: bool = True

    @nn.compact
    def __call__(self, vox_feat: jax.Array, img_feat_rgb_dir: jax.Array):
        """Args:
          vox_feat: (..., voxel_dim).
          img_feat_rgb_dir: (..., V, feat_dim+3+4).

        Returns:
          sigma: (...,), rgb: (..., 3).
        """
        V = img_feat_rgb_dir.shape[-2]
        img_feat = ViewAggregator(self.viewdir_agg, name="agg")(img_feat_rgb_dir)
        vox_img = jnp.concatenate([vox_feat, img_feat], axis=-1)
        x = nn.relu(nn.Dense(self.hid_dim, name="lr0")(vox_img))
        sigma = nn.softplus(nn.Dense(1, name="sigma")(x))[..., 0]

        w_feat = jnp.concatenate([x, vox_img], axis=-1)
        w_feat = jnp.broadcast_to(
            w_feat[..., None, :], w_feat.shape[:-1] + (V, w_feat.shape[-1])
        )
        w_feat = jnp.concatenate([w_feat, img_feat_rgb_dir], axis=-1)
        w = nn.relu(nn.Dense(self.hid_dim, name="color0")(w_feat))
        w = nn.relu(nn.Dense(1, name="color1")(w))
        w = nn.softmax(w, axis=-2)
        rgb = jnp.sum(img_feat_rgb_dir[..., -7:-4] * w, axis=-2)
        return sigma, rgb
