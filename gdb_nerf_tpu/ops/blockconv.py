"""Exact space-to-depth rewriting of small-channel stride-1 convolutions.

TPU vector lanes are 128 wide; a C=8 NHWC conv uses 8 of 128 lanes and runs
~16x below the chip's conv throughput (measured in PERF.md).  A stride-1
convolution is *exactly* equivalent to a convolution over the
space-to-depth-transformed input with a "block kernel" that scatters the
original taps across block offsets:

    o(s*I + q) = sum_dy k(dy) x(s*I + q + dy - ph)
               = sum_{B, p : s*B + p = q + dy} KB(B, p, q) X(I + B, p)

where X is the input cut into s-pixel blocks (channels s^2*Cin) and
KB(B, p->q) = k(s*B + p - q) wherever that index is a valid tap.  For
kernel size k <= s + 1 the block kernel is 2x2 — a dense MXU-friendly conv
with s^2-fold wider channels at 1/s^2 the spatial positions.  The rewrite
costs (4 s^2) / k^2 more MACs (1.78x for k=3, s=2; 7.1x for k=3, s=4) but
runs on full lanes, a net ~2x wall-clock win for C<=16 convs (measured in
tools/microbench_blockconv.py).

The transform is numerically exact up to float summation order.  It is a
*call-time* rewrite: parameters keep their reference HWIO shapes, so
checkpoint conversion (tools/convert_checkpoint.py) is untouched.

No reference analog — the reference's cuDNN picks kernels freely
(/root/reference/networks/gdb_nerf/feature_net.py uses plain nn.Conv2d);
this module plays that role for XLA:TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def _block_kernel_2d(kernel: jax.Array, s: int) -> jax.Array:
    """Scatter a (kh, kw, Cin, Co) stride-1 kernel into a (2, 2, s^2*Cin,
    s^2*Co) block kernel (block-channel order: (py, px, cin) / (qy, qx, co))."""
    kh, kw, cin, co = kernel.shape
    kb = jnp.zeros((2, 2, s, s, cin, s, s, co), dtype=kernel.dtype)
    # One static set per valid (By,Bx,py,px,qy,qx) combo — O(4 s^4) tiny
    # updates on a weight-sized tensor, traced once per compile.
    for By in range(2):
        for Bx in range(2):
            for py in range(s):
                for px in range(s):
                    for qy in range(s):
                        for qx in range(s):
                            dy = s * By + py - qy
                            dx = s * Bx + px - qx
                            if 0 <= dy < kh and 0 <= dx < kw:
                                kb = kb.at[By, Bx, py, px, :, qy, qx, :].set(
                                    kernel[dy, dx]
                                )
    return kb.reshape(2, 2, s * s * cin, s * s * co)


def conv2d_blocked(
    x: jax.Array, kernel: jax.Array, s: int
) -> jax.Array:
    """SAME-padded stride-1 2D conv via space-to-depth blocks.

    Args:
      x: (N, H, W, Cin) with H, W divisible by s.
      kernel: (kh, kw, Cin, Co) HWIO, kh, kw odd and <= s + 1.
      s: block size (2 or 4).

    Returns: (N, H, W, Co), exactly conv(x, kernel, SAME) up to summation
    order.
    """
    N, H, W, Cin = x.shape
    kh, kw, _, Co = kernel.shape
    ph, pw = kh // 2, kw // 2
    assert kh <= s + 1 and kw <= s + 1, (kh, kw, s)
    assert H % s == 0 and W % s == 0, (H, W, s)

    xp = jnp.pad(x, ((0, 0), (ph, s - ph), (pw, s - pw), (0, 0)))
    Hb, Wb = H // s + 1, W // s + 1
    xb = xp.reshape(N, Hb, s, Wb, s, Cin)
    xb = xb.transpose(0, 1, 3, 2, 4, 5).reshape(N, Hb, Wb, s * s * Cin)

    kb = _block_kernel_2d(kernel, s)
    ob = lax.conv_general_dilated(
        xb, kb, window_strides=(1, 1), padding="VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )  # (N, H/s, W/s, s^2*Co)
    o = ob.reshape(N, H // s, W // s, s, s, Co)
    return o.transpose(0, 1, 3, 2, 4, 5).reshape(N, H, W, Co)


def _block_kernel_3d(kernel: jax.Array, s: int) -> jax.Array:
    """(kz, kh, kw, Cin, Co) -> (kz, 2, 2, s^2*Cin, s^2*Co); z stays dense."""
    kz, kh, kw, cin, co = kernel.shape
    kb = jnp.zeros((kz, 2, 2, s, s, cin, s, s, co), dtype=kernel.dtype)
    for By in range(2):
        for Bx in range(2):
            for py in range(s):
                for px in range(s):
                    for qy in range(s):
                        for qx in range(s):
                            dy = s * By + py - qy
                            dx = s * Bx + px - qx
                            if 0 <= dy < kh and 0 <= dx < kw:
                                kb = kb.at[:, By, Bx, py, px, :, qy, qx, :].set(
                                    kernel[:, dy, dx]
                                )
    return kb.reshape(kz, 2, 2, s * s * cin, s * s * co)


def conv3d_blocked(x: jax.Array, kernel: jax.Array, s: int) -> jax.Array:
    """SAME stride-1 3D conv with the H/W axes space-to-depth blocked.

    Args:
      x: (N, D, H, W, Cin), H and W divisible by s (D stays dense — cost
        volumes have D in [8, 64], already a fine lane multiplier via C).
      kernel: (kz, kh, kw, Cin, Co), kh, kw <= s + 1.
    Returns: (N, D, H, W, Co).
    """
    N, D, H, W, Cin = x.shape
    kz, kh, kw, _, Co = kernel.shape
    pz, ph, pw = kz // 2, kh // 2, kw // 2
    assert kh <= s + 1 and kw <= s + 1, (kh, kw, s)
    assert H % s == 0 and W % s == 0, (H, W, s)

    xp = jnp.pad(x, ((0, 0), (0, 0), (ph, s - ph), (pw, s - pw), (0, 0)))
    Hb, Wb = H // s + 1, W // s + 1
    xb = xp.reshape(N, D, Hb, s, Wb, s, Cin)
    xb = xb.transpose(0, 1, 2, 4, 3, 5, 6).reshape(N, D, Hb, Wb, s * s * Cin)

    kb = _block_kernel_3d(kernel, s)
    ob = lax.conv_general_dilated(
        xb, kb, window_strides=(1, 1, 1),
        padding=((pz, pz), (0, 0), (0, 0)),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )  # (N, D, H/s, W/s, s^2*Co)
    o = ob.reshape(N, D, H // s, W // s, s, s, Co)
    return o.transpose(0, 1, 2, 4, 3, 5, 6).reshape(N, D, H, W, Co)
