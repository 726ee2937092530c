"""Shift+dot convolution lowering for small-channel convs.

XLA's conv_general_dilated on this TPU toolchain runs well below bandwidth
at the pipeline's channel widths (C=8..32: 0.94 ms per 512x640 C8 conv).
Lowering the same convolution as K^nd shifted views of a once-padded input,
each hitting a (C_in, C_out) dot that XLA fuses into one accumulation
kernel, measures 1.5x faster at identical results
(tools/microbench_conv_lowering.py: 0.61 ms/conv; PERF.md round 3).

The kernel layout is HWIO / DHWIO — identical to nn.Conv / the checkpoint
converter's output — so models can switch lowering without touching the
parameter tree.

No reference analog: this replaces cuDNN dispatch
(/root/reference/networks/gdb_nerf/modules.py uses nn.Conv2d/3d).
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv_shifts(
    x: jax.Array,
    kernel: jax.Array,
    strides: Sequence[int],
    padding: Sequence[tuple[int, int]],
) -> jax.Array:
    """Channels-last convolution as sum of shifted (C_in, C_out) dots.

    Args:
      x: (..., *spatial, C_in) — any number of leading batch dims.
      kernel: (*k, C_in, C_out) HWIO/DHWIO.
      strides: per-spatial-dim stride.
      padding: per-spatial-dim (lo, hi) zero padding.

    Returns:
      (..., *out_spatial, C_out) with out = (in + lo + hi - k) // stride + 1.
    """
    nd = kernel.ndim - 2
    spatial = x.shape[-nd - 1 : -1]
    lead = x.ndim - nd - 1
    pad_cfg = [(0, 0)] * lead + list(padding) + [(0, 0)]
    xp = jnp.pad(x, pad_cfg)

    out_spatial = [
        (spatial[d] + sum(padding[d]) - kernel.shape[d]) // strides[d] + 1
        for d in range(nd)
    ]

    out = None
    for tap in _taps(kernel.shape[:nd]):
        idx = (slice(None),) * lead + tuple(
            slice(tap[d], tap[d] + out_spatial[d] * strides[d], strides[d])
            for d in range(nd)
        )
        part = jnp.dot(
            xp[idx], kernel[tap], preferred_element_type=x.dtype
        )
        out = part if out is None else out + part
    return out


def _taps(kshape):
    if len(kshape) == 1:
        return [(i,) for i in range(kshape[0])]
    rest = _taps(kshape[1:])
    return [(i,) + r for i in range(kshape[0]) for r in rest]


def deconv_subpixel(x: jax.Array, kernel: jax.Array) -> jax.Array:
    """Transposed conv (k=3, s=2, p=1, output_padding=1; out = 2*in) as a
    subpixel parity decomposition — zero wasted FLOPs.

    XLA lowers the equivalent lhs-dilated convolution at OUTPUT resolution,
    so (2^nd - 1)/2^nd of its multiply-adds hit interleaved zeros.  Writing
    out the dilation algebra per output parity instead:

      out[2i]   = k[1] @ x[i]                      (even: one tap)
      out[2i+1] = k[0] @ x[i] + k[2] @ x[i+1]      (odd: two taps)

    per spatial dim (x hi-padded by one zero), then interleaving the 2^nd
    parity classes pixel-shuffle style.  Kernel layout matches DeconvBlock's
    parameter: (*k, C_in, C_out) in gather-conv orientation.
    """
    nd = kernel.ndim - 2
    spatial = x.shape[-nd - 1 : -1]
    lead = x.ndim - nd - 1
    cout = kernel.shape[-1]

    xp = jnp.pad(x, [(0, 0)] * lead + [(0, 1)] * nd + [(0, 0)])

    # Per-dim tap menus: parity 0 -> [(kernel idx 1, offset 0)],
    # parity 1 -> [(0, 0), (2, 1)].
    menus = {0: [(1, 0)], 1: [(0, 0), (2, 1)]}

    classes = []
    for parity in _taps((2,) * nd):
        acc = None
        for combo in _product([menus[p] for p in parity]):
            kidx = tuple(c[0] for c in combo)
            off = tuple(c[1] for c in combo)
            idx = (slice(None),) * lead + tuple(
                slice(off[d], off[d] + spatial[d]) for d in range(nd)
            )
            part = jnp.dot(
                xp[idx], kernel[kidx], preferred_element_type=x.dtype
            )
            acc = part if acc is None else acc + part
        classes.append(acc)

    # Interleave: stack classes -> (..., *spatial, 2^nd, C) -> per-dim
    # (s_d, 2) interleave -> (..., *2*spatial, C).
    stacked = jnp.stack(classes, axis=-2)  # class-major, parity bits msb->lsb
    shape = stacked.shape[:lead] + tuple(spatial) + (2,) * nd + (cout,)
    stacked = stacked.reshape(shape)
    # Move each parity axis right after its spatial axis.
    perm = list(range(lead))
    for d in range(nd):
        perm += [lead + d, lead + nd + d]
    perm += [lead + 2 * nd]
    stacked = stacked.transpose(perm)
    out_shape = stacked.shape[:lead] + tuple(2 * s for s in spatial) + (cout,)
    return stacked.reshape(out_shape)


def _product(menus):
    if len(menus) == 1:
        return [(m,) for m in menus[0]]
    rest = _product(menus[1:])
    return [(m,) + r for m in menus[0] for r in rest]


class FastConv(nn.Module):
    """Drop-in for bias-free nn.Conv with the shift+dot lowering.

    Same parameter ('kernel', HWIO) — construct with name='Conv_0' to keep
    checkpoint trees identical to the nn.Conv version.
    """

    features: int
    kernel_size: Sequence[int]
    strides: Sequence[int] | None = None
    padding: Sequence[tuple[int, int]] | None = None
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> jax.Array:
        nd = len(self.kernel_size)
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            tuple(self.kernel_size) + (x.shape[-1], self.features),
        )
        return conv_shifts(
            x,
            kernel.astype(x.dtype),
            self.strides or (1,) * nd,
            self.padding or [(0, 0)] * nd,
        )
