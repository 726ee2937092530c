"""Shared conv building blocks (channels-last, BatchNorm + ReLU).

Equivalents of the reference's conv/deconv blocks
(/root/reference/networks/gdb_nerf/modules.py): Conv -> BatchNorm -> ReLU,
bias-free convs.  Layout is NHWC / NDHWC (TPU-native); BatchNorm follows
torch semantics (eps 1e-5, running-stat momentum 0.1 -> flax momentum 0.9)
and takes an optional ``axis_name`` so that data-parallel training
cross-replica-averages batch statistics (the SyncBatchNorm equivalent).

The transposed conv is expressed directly as an input-dilated conv with the
exact padding arithmetic of torch's ConvTranspose(kernel=3, stride=2,
padding=1, output_padding=1), i.e. out = 2 * in.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from gdb_nerf_tpu.ops import fastconv

# Lowering toggles for the small-channel convs: route ConvBlock through the
# shift+dot lowering and DeconvBlock through the subpixel lowering
# (ops/fastconv.py; identical parameter trees).  Module-globals so A/B tools
# can flip them without threading fields through every model; read at trace
# time.  Env override for bisection: GDBN_FASTCONV=0|conv|deconv|1.
#
# Default is DECONV-ONLY: the shift+dot ConvBlock lowering wins every
# microbench (1.5x at C=8, in-graph chains) but REGRESSES the fused
# 512x640 frame 59 -> 113 ms (full-graph A/B, PERF.md round 3) — the
# 9/27-way slice+dot expansion defeats XLA's cross-stage fusion at whole-
# program scale.  The subpixel deconv is frame-neutral (58.9 vs 59.0 ms)
# and 4.2x standalone, so it stays.
import os as _os

_mode = _os.environ.get("GDBN_FASTCONV", "deconv")
USE_FAST_CONV = _mode in ("1", "conv")
USE_FAST_DECONV = _mode in ("1", "deconv")

# Depth-folded U-Net convs (ops/dfold.py): at eval, 3^3 convs over small-D
# volumes run as 2D convs over (H, W, D*C) with banded dense kernels —
# 2.85x per conv at the stage-1 shape (tools/microbench_chanpack.py).
# Same op count, same param tree; exact up to bf16 reduction order.
USE_DFOLD = _os.environ.get("GDBN_DFOLD", "1") == "1"


def set_dfold(enabled: bool) -> None:
    global USE_DFOLD
    USE_DFOLD = enabled


class KernelParam(nn.Module):
    """Owns a conv kernel parameter under the same name/shape/init as
    ``nn.Conv(use_bias=False)`` would, without binding the computation —
    the folded conv paths read it and lower the conv themselves."""

    shape: Sequence[int]

    @nn.compact
    def __call__(self) -> jax.Array:
        return self.param(
            "kernel", nn.initializers.lecun_normal(), tuple(self.shape)
        )


def set_fast_conv(enabled: bool, deconv: bool | None = None) -> None:
    global USE_FAST_CONV, USE_FAST_DECONV
    USE_FAST_CONV = enabled
    USE_FAST_DECONV = enabled if deconv is None else deconv


class ConvBlock(nn.Module):
    """Conv(bias-free) + BatchNorm + ReLU for 2D or 3D (by kernel length)."""

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: Sequence[int] | None = None
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool,
        fold_d: Optional[int] = None,
        fold_block: Optional[int] = None,
    ) -> jax.Array:
        ndim = len(self.kernel_size)
        strides = self.strides or (1,) * ndim
        pad = self.padding or (0,) * ndim
        if fold_d is not None:
            return self._folded(x, train, fold_d, tuple(strides))
        if fold_block is not None:
            return self._block_folded(x, train, fold_block, tuple(strides))
        if USE_FAST_CONV:
            x = fastconv.FastConv(
                self.features,
                kernel_size=tuple(self.kernel_size),
                strides=tuple(strides),
                padding=[(p, p) for p in pad],
                dtype=self.dtype,
                name="Conv_0",
            )(x.astype(self.dtype))
        else:
            x = nn.Conv(
                self.features,
                kernel_size=tuple(self.kernel_size),
                strides=tuple(strides),
                padding=[(p, p) for p in pad],
                use_bias=False,
                dtype=self.dtype,
            )(x.astype(self.dtype))
        x = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(x)
        return nn.relu(x)

    def _folded(self, x, train, fold_d, strides):
        """Depth-folded lowering: x is (B, H, W, fold_d*C_in) d-major; the
        3^3 conv runs as a 2D conv with the banded kernel (ops/dfold.py).
        Param tree is identical to the 3D path (KernelParam mirrors
        nn.Conv's 'Conv_0/kernel'; BN runs on a (..., d, C) view so its
        (C,) stats reduce over (B, H, W, d) exactly like torch BN3d)."""
        from gdb_nerf_tpu.ops import dfold

        assert len(self.kernel_size) == 3 and tuple(self.kernel_size) == (
            3, 3, 3,
        ), self.kernel_size
        assert tuple(self.padding or ()) == (1, 1, 1), self.padding
        cin = x.shape[-1] // fold_d
        w = KernelParam((3, 3, 3, cin, self.features), name="Conv_0")()
        if strides == (1, 1, 1):
            wk, s2, d_out = dfold.fold_kernel(w, fold_d), (1, 1), fold_d
        else:
            assert strides == (2, 2, 2), strides
            wk = dfold.fold_kernel_strided(w, fold_d)
            s2, d_out = (2, 2), fold_d // 2
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            wk.astype(self.dtype),
            s2,
            [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        B, H2, W2 = y.shape[0], y.shape[1], y.shape[2]
        y = y.reshape(B, H2, W2, d_out, self.features)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(y)
        return nn.relu(y).reshape(B, H2, W2, d_out * self.features)

    def _block_folded(self, x, train, k, strides):
        """Partial depth fold: x is (B, D', H, W, k*C_in); the 3^3 conv
        stays 3D over D' blocks with the block-banded kernel
        (ops/dfold.py).  Output keeps the same k."""
        from gdb_nerf_tpu.ops import dfold

        assert tuple(self.kernel_size) == (3, 3, 3), self.kernel_size
        assert tuple(self.padding or ()) == (1, 1, 1), self.padding
        cin = x.shape[-1] // k
        w = KernelParam((3, 3, 3, cin, self.features), name="Conv_0")()
        if strides == (1, 1, 1):
            wk = dfold.fold_kernel_block(w, k)
        else:
            assert strides == (2, 2, 2), strides
            wk = dfold.fold_kernel_block_strided(w, k)
        y = jax.lax.conv_general_dilated(
            x.astype(self.dtype),
            wk.astype(self.dtype),
            strides,
            [(1, 1)] * 3,
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )
        B, Dp, H2, W2 = y.shape[:4]
        y = y.reshape(B, Dp, H2, W2, k, self.features)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(y)
        return nn.relu(y).reshape(B, Dp, H2, W2, k * self.features)


class DeconvBlock(nn.Module):
    """Transposed conv (k=3, s=2, p=1, op=1 torch arithmetic) + BN + ReLU.

    Implemented as lhs-dilated convolution: dilate the input by the stride,
    pad (k-1-p, k-1-p+output_padding) = (1, 2) per spatial dim, then run a
    plain convolution.  The stored kernel is in gather-conv orientation; the
    torch checkpoint converter flips it spatially and swaps I/O.
    """

    features: int
    ndim: int = 3
    bn_momentum: float = 0.9
    axis_name: Optional[str] = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        x: jax.Array,
        train: bool,
        fold_d: Optional[int] = None,
        fold_block: Optional[int] = None,
    ) -> jax.Array:
        x = x.astype(self.dtype)
        k, s, p, op = 3, 2, 1, 1
        fold = fold_d or fold_block
        in_features = x.shape[-1] if fold is None else x.shape[-1] // fold
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (k,) * self.ndim + (in_features, self.features),
        )
        if fold_d is not None:
            return self._folded(x, train, fold_d, kernel)
        if fold_block is not None:
            return self._block_folded(x, train, fold_block, kernel)
        if USE_FAST_DECONV:
            y = fastconv.deconv_subpixel(x, kernel.astype(x.dtype))
        else:
            if self.ndim == 2:
                dn = ("NHWC", "HWIO", "NHWC")
            else:
                dn = ("NDHWC", "DHWIO", "NDHWC")
            pad = [(k - 1 - p, k - 1 - p + op)] * self.ndim
            y = jax.lax.conv_general_dilated(
                x,
                kernel.astype(x.dtype),
                window_strides=(1,) * self.ndim,
                padding=pad,
                lhs_dilation=(s,) * self.ndim,
                dimension_numbers=dn,
            )
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(y)
        return nn.relu(y)

    def _folded(self, x, train, fold_d, kernel):
        """Depth-folded transposed conv: the D-upsample becomes channel
        structure (ops/dfold.py::fold_kernel_deconv); H/W keep the
        lhs-dilated (or subpixel) 2D lowering.  Output is (B, 2H, 2W,
        2*fold_d*features), d-major."""
        from gdb_nerf_tpu.ops import dfold
        from gdb_nerf_tpu.ops import fastconv as _fc

        assert self.ndim == 3, self.ndim
        wk = dfold.fold_kernel_deconv(kernel, fold_d).astype(x.dtype)
        if USE_FAST_DECONV:
            y = _fc.deconv_subpixel(x, wk)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                wk,
                (1, 1),
                [(1, 2), (1, 2)],
                lhs_dilation=(2, 2),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        d_out = 2 * fold_d
        B, H2, W2 = y.shape[0], y.shape[1], y.shape[2]
        y = y.reshape(B, H2, W2, d_out, self.features)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(y)
        return nn.relu(y).reshape(B, H2, W2, d_out * self.features)

    def _block_folded(self, x, train, k, kernel):
        """Partial depth fold: transposed conv over (D', H, W) blocks with
        the block-banded deconv kernel; output keeps the same k."""
        from gdb_nerf_tpu.ops import dfold
        from gdb_nerf_tpu.ops import fastconv as _fc

        assert self.ndim == 3, self.ndim
        wk = dfold.fold_kernel_block_deconv(kernel, k).astype(x.dtype)
        if USE_FAST_DECONV:
            y = _fc.deconv_subpixel(x, wk)
        else:
            y = jax.lax.conv_general_dilated(
                x,
                wk,
                (1, 1, 1),
                [(1, 2)] * 3,
                lhs_dilation=(2, 2, 2),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )
        B, Dp, H2, W2 = y.shape[:4]
        y = y.reshape(B, Dp, H2, W2, k, self.features)
        y = nn.BatchNorm(
            use_running_average=not train,
            momentum=self.bn_momentum,
            epsilon=1e-5,
            axis_name=self.axis_name if train else None,
            dtype=self.dtype,
        )(y)
        return nn.relu(y).reshape(B, Dp, H2, W2, k * self.features)


class MLP(nn.Module):
    """Dense -> activation stack (activation after every layer)."""

    features: Sequence[int]
    activation: str = "relu"

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        act = {"relu": nn.relu, "softplus": nn.softplus, "sigmoid": nn.sigmoid}[
            self.activation
        ]
        for f in self.features:
            x = act(nn.Dense(f)(x))
        return x
