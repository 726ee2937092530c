"""Residual-Dense-Network decoder: bundle feature map -> full-res RGB.

Capability-equivalent of the reference Decoder
(/root/reference/networks/gdb_nerf/decoder_rdn.py): in-conv, a stack of
residual dense blocks with SE channel attention, log2(b) PixelShuffle
upsampling stages, and a 1x1 output conv.  NHWC, batched.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdb_nerf_tpu.ops.loops import unrolled_vmap
from gdb_nerf_tpu.ops.resize import pixel_shuffle


class SEBlock(nn.Module):
    channels: int
    reduction: int = 16
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, C) -> channel-reweighted (B, H, W, C)."""
        y = x.mean(axis=(1, 2))  # (B, C)
        y = nn.relu(
            nn.Dense(self.channels // self.reduction, use_bias=False,
                     dtype=self.dtype)(y)
        )
        y = nn.sigmoid(nn.Dense(self.channels, use_bias=False, dtype=self.dtype)(y))
        return x * y[:, None, None, :]


class ResidualDenseBlock(nn.Module):
    num_feats: int
    growth_rate: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        kw = dict(padding=1, use_bias=False, dtype=self.dtype)
        x1 = nn.relu(nn.Conv(self.growth_rate, (3, 3), **kw)(x))
        x2 = nn.relu(
            nn.Conv(self.growth_rate, (3, 3), **kw)(
                jnp.concatenate([x, x1], axis=-1)
            )
        )
        x3 = nn.Conv(self.num_feats, (3, 3), **kw)(
            jnp.concatenate([x, x1, x2], axis=-1)
        )
        return x + SEBlock(self.num_feats, dtype=self.dtype)(x3)


class Decoder(nn.Module):
    out_channels: int = 3
    num_feats: int = 64
    num_layers: int = 3
    upscale_factor: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        """x: (B, H, W, C_in) -> (B, H*b, W*b, out_channels)."""
        if self.upscale_factor <= 0 or (
            self.upscale_factor & (self.upscale_factor - 1)
        ):
            raise ValueError("upscale_factor must be a power of 2")
        x = x.astype(self.dtype)
        shallow = nn.Conv(self.num_feats, (3, 3), padding=1, dtype=self.dtype)(x)
        h = shallow
        for _ in range(self.num_layers):
            h = ResidualDenseBlock(self.num_feats, dtype=self.dtype)(h)
        h = shallow + h
        for _ in range(int(round(math.log2(self.upscale_factor)))):
            h = nn.Conv(4 * self.num_feats, (3, 3), padding=1, dtype=self.dtype)(h)
            h = unrolled_vmap(lambda t: pixel_shuffle(t, 2), (0,))(h)
        return nn.Conv(self.out_channels, (1, 1), dtype=jnp.float32)(
            h.astype(jnp.float32)
        )
