"""3D U-Nets for cost-volume regularization (NDHWC, batched).

Capability-equivalent of the reference CostRegNet / CostRegNet_small
(/root/reference/networks/gdb_nerf/cost_reg_net.py): encoder with stride-2
3D convs, transposed-conv decoder with additive skips, and two heads — an
8-dim voxel feature volume and a softmax depth-probability volume.
BatchNorm statistics are taken over (batch, D, H, W) as in torch BN3d.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdb_nerf_tpu.models.layers import ConvBlock, DeconvBlock
from gdb_nerf_tpu.models import layers
from gdb_nerf_tpu.ops.fastconv import FastConv


def _head_conv(features: int, dtype, name: str):
    """Bias-free 3x3x3 output head, fast-lowered when the toggle is on."""
    if layers.USE_FAST_CONV:
        return FastConv(
            features, (3, 3, 3), padding=[(1, 1)] * 3, dtype=dtype, name=name
        )
    return nn.Conv(
        features, (3, 3, 3), padding=1, use_bias=False, dtype=dtype, name=name
    )


class CostRegNet(nn.Module):
    """Full 3-down / 3-up variant (used for the fine stage)."""

    out_channels: int
    base_channels: int
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool):
        """Args: x (B, D, H, W, C). Returns (feat (B,D,H,W,out), prob (B,D,H,W))."""
        bc = self.base_channels
        kw = dict(
            kernel_size=(3, 3, 3), padding=(1, 1, 1), axis_name=self.axis_name,
            dtype=self.dtype,
        )
        skw = dict(
            kernel_size=(3, 3, 3),
            strides=(2, 2, 2),
            padding=(1, 1, 1),
            axis_name=self.axis_name,
            dtype=self.dtype,
        )
        D = x.shape[1]
        # Depth-folded eval path: at the shipped stage-1 shape (D=8) every
        # level of this U-Net folds to a constant D_l*C_l = D*bc channels,
        # so the whole net runs as 2D convs at full lane occupancy
        # (2.85x/conv — PERF.md round 3; exact, same param tree).
        if (not train) and layers.USE_DFOLD and D % 8 == 0 and D <= 16:
            return self._folded(x, train, kw, skw, dkw=dict(
                axis_name=self.axis_name, dtype=self.dtype))

        # Blocks are created in execution order so converted torch
        # checkpoints map onto ConvBlock_{i} sequentially.
        c0 = ConvBlock(bc, **kw)(x, train)
        d1 = ConvBlock(bc * 2, **skw)(c0, train)
        c2 = ConvBlock(bc * 2, **kw)(d1, train)
        d3 = ConvBlock(bc * 4, **skw)(c2, train)
        c4 = ConvBlock(bc * 4, **kw)(d3, train)
        d5 = ConvBlock(bc * 8, **skw)(c4, train)
        bott = ConvBlock(bc * 8, **kw)(d5, train)

        dkw = dict(axis_name=self.axis_name, dtype=self.dtype)
        up = c4 + DeconvBlock(bc * 4, **dkw)(bott, train)
        up = c2 + DeconvBlock(bc * 2, **dkw)(up, train)
        up = c0 + DeconvBlock(bc, **dkw)(up, train)

        feat = _head_conv(self.out_channels, self.dtype, "Conv_0")(up)
        logits = _head_conv(1, self.dtype, "Conv_1")(up)[..., 0]
        prob = nn.softmax(logits.astype(jnp.float32), axis=1)  # over depth axis
        return feat, prob

    def _folded(self, x, train, kw, skw, dkw):
        """Same blocks, same creation order, depth-folded layouts."""
        from gdb_nerf_tpu.ops import dfold

        bc = self.base_channels
        D = x.shape[1]
        xf = dfold.fold_volume(x.astype(self.dtype))

        c0 = ConvBlock(bc, **kw)(xf, train, fold_d=D)
        d1 = ConvBlock(bc * 2, **skw)(c0, train, fold_d=D)
        c2 = ConvBlock(bc * 2, **kw)(d1, train, fold_d=D // 2)
        d3 = ConvBlock(bc * 4, **skw)(c2, train, fold_d=D // 2)
        c4 = ConvBlock(bc * 4, **kw)(d3, train, fold_d=D // 4)
        d5 = ConvBlock(bc * 8, **skw)(c4, train, fold_d=D // 4)
        bott = ConvBlock(bc * 8, **kw)(d5, train, fold_d=D // 8)

        up = c4 + DeconvBlock(bc * 4, **dkw)(bott, train, fold_d=D // 8)
        up = c2 + DeconvBlock(bc * 2, **dkw)(up, train, fold_d=D // 4)
        up = c0 + DeconvBlock(bc, **dkw)(up, train, fold_d=D // 2)

        dt = self.dtype
        feat_k = layers.KernelParam(
            (3, 3, 3, bc, self.out_channels), name="Conv_0")()
        prob_k = layers.KernelParam((3, 3, 3, bc, 1), name="Conv_1")()
        feat = jax.lax.conv_general_dilated(
            up, dfold.fold_kernel(feat_k, D).astype(dt), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        logits = jax.lax.conv_general_dilated(
            up, dfold.fold_kernel(prob_k, D).astype(dt), (1, 1),
            [(1, 1), (1, 1)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )  # (B, H, W, D)
        prob = nn.softmax(
            jnp.transpose(logits, (0, 3, 1, 2)).astype(jnp.float32), axis=1
        )
        return dfold.unfold_volume(feat, D), prob


class CostRegNetSmall(nn.Module):
    """2-down / 2-up variant (used for the coarse stage)."""

    out_channels: int
    base_channels: int
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool):
        bc = self.base_channels
        kw = dict(
            kernel_size=(3, 3, 3), padding=(1, 1, 1), axis_name=self.axis_name,
            dtype=self.dtype,
        )
        skw = dict(
            kernel_size=(3, 3, 3),
            strides=(2, 2, 2),
            padding=(1, 1, 1),
            axis_name=self.axis_name,
            dtype=self.dtype,
        )
        dkw = dict(axis_name=self.axis_name, dtype=self.dtype)
        D = x.shape[1]
        # Partial depth fold at eval (blocks of k=8 rows -> k*C = 64..256
        # folded channels, conv stays 3D over D' = D/k): 1.7x per conv at
        # the stage-0 shape (PERF.md round 3).  Needs D' to halve twice.
        if (not train) and layers.USE_DFOLD and D % 32 == 0:
            return self._block_folded(x, train, kw, skw, dkw, k=8)

        c0 = ConvBlock(bc, **kw)(x, train)
        d1 = ConvBlock(bc * 2, **skw)(c0, train)
        c2 = ConvBlock(bc * 2, **kw)(d1, train)
        d3 = ConvBlock(bc * 4, **skw)(c2, train)
        bott = ConvBlock(bc * 4, **kw)(d3, train)

        up = c2 + DeconvBlock(bc * 2, **dkw)(bott, train)
        up = c0 + DeconvBlock(bc, **dkw)(up, train)

        feat = _head_conv(self.out_channels, self.dtype, "Conv_0")(up)
        logits = _head_conv(1, self.dtype, "Conv_1")(up)[..., 0]
        prob = nn.softmax(logits.astype(jnp.float32), axis=1)
        return feat, prob

    def _block_folded(self, x, train, kw, skw, dkw, k):
        """Same blocks, same creation order, block-folded layouts."""
        from gdb_nerf_tpu.ops import dfold

        bc = self.base_channels
        D = x.shape[1]
        xf = dfold.fold_volume_block(x.astype(self.dtype), k)

        c0 = ConvBlock(bc, **kw)(xf, train, fold_block=k)
        d1 = ConvBlock(bc * 2, **skw)(c0, train, fold_block=k)
        c2 = ConvBlock(bc * 2, **kw)(d1, train, fold_block=k)
        d3 = ConvBlock(bc * 4, **skw)(c2, train, fold_block=k)
        bott = ConvBlock(bc * 4, **kw)(d3, train, fold_block=k)

        up = c2 + DeconvBlock(bc * 2, **dkw)(bott, train, fold_block=k)
        up = c0 + DeconvBlock(bc, **dkw)(up, train, fold_block=k)

        dt = self.dtype
        feat_k = layers.KernelParam(
            (3, 3, 3, bc, self.out_channels), name="Conv_0")()
        prob_k = layers.KernelParam((3, 3, 3, bc, 1), name="Conv_1")()
        feat = jax.lax.conv_general_dilated(
            up, dfold.fold_kernel_block(feat_k, k).astype(dt), (1, 1, 1),
            [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        logits = jax.lax.conv_general_dilated(
            up, dfold.fold_kernel_block(prob_k, k).astype(dt), (1, 1, 1),
            [(1, 1)] * 3, dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )  # (B, D', H, W, k*1)
        prob = nn.softmax(
            dfold.unfold_volume_block(logits, k)[..., 0].astype(jnp.float32),
            axis=1,
        )
        return dfold.unfold_volume_block(feat, k), prob
