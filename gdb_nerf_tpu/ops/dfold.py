"""Depth-axis channel folding for the stage-1 3D U-Net.

The cost-volume U-Nets convolve (B, D, H, W, C) volumes with C=8..64 —
far below the TPU's 128-lane registers, so XLA's conv runs at a fraction
of the MXU rate (PERF.md: 0.4-1.0 TF/s in-graph for the C=8 convs).  When
D is small (stage 1: D=8), the D axis folds into channels: a 3^3 conv over
(D, H, W, C) is EXACTLY a 3x3 2D conv over (H, W, D*C) whose dense kernel
is the banded expansion of the 3D kernel — the D taps collapse into the
channel dimension (27 taps -> 9), trading a 2.67x FLOP increase for 8x
lane occupancy.  Replaces the reference's cuDNN 3D convs
(/root/reference/networks/gdb_nerf/cost_reg_net.py) with an MXU-shaped
lowering rather than a translation.

Folded layout is d-major: channel index = d * C + c.  All transforms here
are exact (same arithmetic, reassociated only by XLA's reduction order).

Kernel orientations match the model's parameters:
  - conv kernels are flax/lax `(kd, kh, kw, C_in, C_out)` DHWIO;
  - deconv kernels are DeconvBlock's gather-conv orientation, consumed by
    an lhs-dilated conv with padding (1, 2) (torch k3/s2/p1/op1: out=2*in).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def fold_volume(x: jax.Array) -> jax.Array:
    """(B, D, H, W, C) -> (B, H, W, D*C), d-major channels."""
    B, D, H, W, C = x.shape
    return jnp.transpose(x, (0, 2, 3, 1, 4)).reshape(B, H, W, D * C)


def unfold_volume(x: jax.Array, D: int) -> jax.Array:
    """(B, H, W, D*C) -> (B, D, H, W, C)."""
    B, H, W, DC = x.shape
    C = DC // D
    return jnp.transpose(x.reshape(B, H, W, D, C), (0, 3, 1, 2, 4))


def fold_kernel(w: jax.Array, D: int) -> jax.Array:
    """(3, kh, kw, Ci, Co) 3D kernel -> (kh, kw, D*Ci, D*Co) banded 2D kernel.

    out[do] = sum_{di - do in [-1, 1]} w[di - do + 1] @ in[di]; missing
    band entries at the D boundary reproduce the 3D conv's zero padding.
    """
    kd, kh, kw, Ci, Co = w.shape
    assert kd == 3, w.shape
    z = jnp.zeros((kh, kw, D * Ci, D * Co), w.dtype)
    for do in range(D):
        for t in range(3):
            di = do + t - 1
            if 0 <= di < D:
                z = z.at[:, :, di * Ci:(di + 1) * Ci,
                         do * Co:(do + 1) * Co].set(w[t])
    return z


def fold_kernel_strided(w: jax.Array, D: int) -> jax.Array:
    """Stride-2-in-D 3^3 conv -> (kh, kw, D*Ci, (D//2)*Co) 2D kernel.

    torch/lax stride-2 pad-1 semantics: output index do reads input rows
    2*do - 1 .. 2*do + 1 (D_out = ceil(D/2); here D is even).
    """
    kd, kh, kw, Ci, Co = w.shape
    assert kd == 3, w.shape
    Do = (D + 1) // 2
    z = jnp.zeros((kh, kw, D * Ci, Do * Co), w.dtype)
    for do in range(Do):
        for t in range(3):
            di = 2 * do + t - 1
            if 0 <= di < D:
                z = z.at[:, :, di * Ci:(di + 1) * Ci,
                         do * Co:(do + 1) * Co].set(w[t])
    return z


def fold_kernel_deconv(w: jax.Array, D: int) -> jax.Array:
    """k3/s2 transposed conv in D -> (kh, kw, D*Ci, 2D*Co) 2D kernel.

    DeconvBlock's lhs-dilated formulation (dilation 2, pad (1, 2), gather
    orientation): out row do reads input row di = (do + t - 1) / 2 when
    integral, i.e. tap t = 2*di - do + 1 for each contributing di.
    """
    kd, kh, kw, Ci, Co = w.shape
    assert kd == 3, w.shape
    z = jnp.zeros((kh, kw, D * Ci, 2 * D * Co), w.dtype)
    for do in range(2 * D):
        for t in range(3):
            num = do + t - 1
            if num % 2:
                continue
            di = num // 2
            if 0 <= di < D:
                z = z.at[:, :, di * Ci:(di + 1) * Ci,
                         do * Co:(do + 1) * Co].set(w[t])
    return z


# ---- Partial (block) folds: D = D' * k, conv stays 3D over D' blocks ----
#
# For stage 0 (D=64) a full 2D fold would need C=512 kernels (9.4 MB each,
# rebuilt per apply); folding blocks of k=8 rows instead keeps the conv 3D
# over D' = D/k with k*C folded channels — 1.7x per conv at the stage-0
# shape (tools/microbench_chanpack.py dfold0).  Entry formulas below are
# derived from row index algebra ri = s*ro + t - 1 (s = stride in D).


def fold_volume_block(x: jax.Array, k: int) -> jax.Array:
    """(B, D, H, W, C) -> (B, D//k, H, W, k*C), row-major within a block."""
    B, D, H, W, C = x.shape
    return x.reshape(B, D // k, k, H, W, C).transpose(0, 1, 3, 4, 2, 5).reshape(
        B, D // k, H, W, k * C
    )


def unfold_volume_block(x: jax.Array, k: int) -> jax.Array:
    """(B, D', H, W, k*C) -> (B, D'*k, H, W, C)."""
    B, Dp, H, W, KC = x.shape
    C = KC // k
    return x.reshape(B, Dp, H, W, k, C).transpose(0, 1, 4, 2, 3, 5).reshape(
        B, Dp * k, H, W, C
    )


def _block_kernel(w: jax.Array, k: int, t_of, dp_taps: int = 3) -> jax.Array:
    """Populate a (dp_taps, kh, kw, k*Ci, k*Co) block kernel from the
    (3, kh, kw, Ci, Co) 3D kernel; t_of(kb, ji, jo) gives the D tap (or an
    out-of-range value for absent entries)."""
    _, kh, kw, Ci, Co = w.shape
    z = jnp.zeros((dp_taps, kh, kw, k * Ci, k * Co), w.dtype)
    for kb in range(dp_taps):
        for ji in range(k):
            for jo in range(k):
                t = t_of(kb, ji, jo)
                if 0 <= t < 3:
                    z = z.at[kb, :, :, ji * Ci:(ji + 1) * Ci,
                             jo * Co:(jo + 1) * Co].set(w[t])
    return z


def fold_kernel_block(w: jax.Array, k: int) -> jax.Array:
    """Stride-1 3^3 conv over folded blocks: ri = ro + t - 1 with
    ri = (bo + kb - 1)*k + ji, ro = bo*k + jo."""
    return _block_kernel(w, k, lambda kb, ji, jo: (kb - 1) * k + ji - jo + 1)


def fold_kernel_block_strided(w: jax.Array, k: int) -> jax.Array:
    """Stride-2-in-D 3^3 conv over folded blocks (D' also strided by 2):
    ri = 2*ro + t - 1 with ri = (2*bo + kb - 1)*k + ji."""
    return _block_kernel(
        w, k, lambda kb, ji, jo: (kb - 1) * k + ji - 2 * jo + 1
    )


def fold_kernel_block_deconv(w: jax.Array, k: int) -> jax.Array:
    """k3/s2 transposed conv over folded blocks (lhs-dilated over D',
    pad (1, 2)): ri = (ro + t - 1)/2 with bi = (bo + kb - 1)/2 enforced by
    the dilation -> t = (kb - 1)*k + 2*ji - jo + 1."""
    return _block_kernel(
        w, k, lambda kb, ji, jo: (kb - 1) * k + 2 * ji - jo + 1
    )
