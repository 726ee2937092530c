"""2D feature pyramid network (FPN) over source images.

Capability-equivalent of the reference FeatureNet
(/root/reference/networks/gdb_nerf/feature_net.py): a 3-level conv pyramid
(stride-2 downsamples to 1/2 and 1/4) with nearest-upsample + 1x1-lateral
top-down merging and per-level output heads producing features of dims
``out_channels`` at scales (1/4, 1/2, 1).  NHWC layout, batched input —
BatchNorm statistics are computed over the full (batch*views) image set, as
in the reference.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdb_nerf_tpu.models import layers
from gdb_nerf_tpu.models.layers import ConvBlock
from gdb_nerf_tpu.ops.fastconv import FastConv
from gdb_nerf_tpu.ops.loops import unrolled_vmap
from gdb_nerf_tpu.ops.resize import upsample_nearest_2x


def _out_conv(features: int, dtype, name: str):
    """Bias-free 3x3 head conv, routed through the fast lowering when on."""
    if layers.USE_FAST_CONV:
        return FastConv(
            features, (3, 3), padding=[(1, 1), (1, 1)], dtype=dtype, name=name
        )
    return nn.Conv(
        features, (3, 3), padding=1, use_bias=False, dtype=dtype, name=name
    )


class FeatureNet(nn.Module):
    base_channels: int = 8
    out_channels: Sequence[int] = (32, 16, 8)
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array, train: bool) -> list[jax.Array]:
        """Args: x (N, H, W, 3) images. Returns [coarse(1/4), mid(1/2), fine(1)]
        each (N, h, w, c)."""
        bc = self.base_channels
        x = x.astype(self.dtype)
        kw = dict(axis_name=self.axis_name, dtype=self.dtype)

        c0 = ConvBlock(bc, (3, 3), padding=(1, 1), **kw)(x, train)
        c0 = ConvBlock(bc, (3, 3), padding=(1, 1), **kw)(c0, train)

        c1 = ConvBlock(bc * 2, (5, 5), strides=(2, 2), padding=(2, 2), **kw)(c0, train)
        c1 = ConvBlock(bc * 2, (3, 3), padding=(1, 1), **kw)(c1, train)

        c2 = ConvBlock(bc * 4, (5, 5), strides=(2, 2), padding=(2, 2), **kw)(c1, train)
        c2 = ConvBlock(bc * 4, (3, 3), padding=(1, 1), **kw)(c2, train)

        out0 = nn.Conv(self.out_channels[0], (1, 1), dtype=self.dtype, name="Conv_0")(c2)

        # Unrolled over the (B*V <= 12) batch: vmap over small leading axes
        # blocks producer fusion on this toolchain (see ops/loops.py).
        up = unrolled_vmap(upsample_nearest_2x, (0,))
        intra = up(c2) + nn.Conv(bc * 4, (1, 1), dtype=self.dtype, name="Conv_1")(c1)
        out1 = _out_conv(self.out_channels[1], self.dtype, "Conv_2")(intra)

        intra = up(intra) + nn.Conv(bc * 4, (1, 1), dtype=self.dtype, name="Conv_3")(c0)
        out2 = _out_conv(self.out_channels[2], self.dtype, "Conv_4")(intra)

        return [out0, out1, out2]
