"""Bilinear/trilinear grid sampling with explicit coordinate conventions.

The whole GDB-NeRF pipeline hinges on sub-pixel feature gathers (plane-sweep
warps, voxel-feature lookups, per-ray RGB fetches; see
/root/reference/networks/gdb_nerf/depth_net.py:93,378,472 and
bundle_sampler.py:323,336 for the behavior being matched).  Off-by-half-pixel
bugs here silently cost dB, so conventions are pinned down once, here:

  * Normalized coordinates in ``[-1, 1]``, `align_corners=False` semantics:
    ``pix = ((norm + 1) * size - 1) / 2`` — i.e. -1/+1 are the *outer edges*
    of the corner pixels, and pixel centers sit at half-integer offsets.
  * ``padding_mode='border'``: indices clamped to the valid range.
  * ``padding_mode='zeros'``: out-of-range taps contribute zero.

All functions are channels-last and operate on a single image/volume; batch /
view dimensions are handled with ``jax.vmap`` at call sites.  XLA lowers the
gathers to TPU dynamic-gather; the Pallas fused variants live in
``gdb_nerf_tpu.ops.pallas``.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Tent-combine formulation for the packed samplers (A/B: GDBN_TENT).
#   "pair"  (default): top/bot row mixes — wx0/wx1 each consumed twice.
#   "stack": one (…, 4) outer-product weight tensor consumed once by a
#            (…, 4, C) tap reduction.  Tried as a fix for the round-4 HLO
#            audit finding (the four (…, bsq, 1)-minor tent-weight buffers
#            tile-pad ~34x, 1.93 GB physical for 56 MB logical per frame) —
#            MEASURED WORSE by the same audit: the (…, 4, C) taps reshape
#            and (…, 4, 1) weight stack materialize with (4, C)-minor
#            padding, 14.7 -> 24.7 GB physical/frame.  Kept for the record;
#            exactness-tested (tests/test_grid_sample.py).
_TENT = os.environ.get("GDBN_TENT", "pair")


def _unnormalize(coord: jax.Array, size: int) -> jax.Array:
    """Map normalized [-1, 1] to pixel coordinates (align_corners=False)."""
    return ((coord + 1.0) * size - 1.0) * 0.5


def _gather_2d(img: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    """Gather pixels from (H, W, C) image at integer (iy, ix) -> (..., C)."""
    H, W, _ = img.shape
    flat = img.reshape(H * W, -1)
    idx = iy * W + ix
    return jnp.take(flat, idx, axis=0, mode="clip")


def grid_sample_2d(
    img: jax.Array,
    grid: jax.Array,
    padding_mode: str = "border",
) -> jax.Array:
    """Bilinear sample of a 2D image at normalized grid locations.

    Args:
      img: (H, W, C) feature map.
      grid: (..., 2) normalized coordinates; ``grid[..., 0]`` is x (width
        axis), ``grid[..., 1]`` is y (height axis), both in [-1, 1].
      padding_mode: 'border' or 'zeros'.

    Returns:
      (..., C) sampled features.
    """
    H, W, C = img.shape
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = x - x0
    wy = y - y0

    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    x1i = x0i + 1
    y1i = y0i + 1

    x0c = jnp.clip(x0i, 0, W - 1)
    x1c = jnp.clip(x1i, 0, W - 1)
    y0c = jnp.clip(y0i, 0, H - 1)
    y1c = jnp.clip(y1i, 0, H - 1)

    v00 = _gather_2d(img, y0c, x0c)
    v01 = _gather_2d(img, y0c, x1c)
    v10 = _gather_2d(img, y1c, x0c)
    v11 = _gather_2d(img, y1c, x1c)

    if padding_mode == "zeros":
        in_x0 = ((x0i >= 0) & (x0i < W)).astype(img.dtype)[..., None]
        in_x1 = ((x1i >= 0) & (x1i < W)).astype(img.dtype)[..., None]
        in_y0 = ((y0i >= 0) & (y0i < H)).astype(img.dtype)[..., None]
        in_y1 = ((y1i >= 0) & (y1i < H)).astype(img.dtype)[..., None]
        v00 = v00 * (in_y0 * in_x0)
        v01 = v01 * (in_y0 * in_x1)
        v10 = v10 * (in_y1 * in_x0)
        v11 = v11 * (in_y1 * in_x1)
    elif padding_mode != "border":
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")

    # Interpolate in the source dtype so bf16 feature fetches stay bf16
    # (the sub-texel weight quantization is ~0.4%, well below feature noise).
    wx = wx[..., None].astype(img.dtype)
    wy = wy[..., None].astype(img.dtype)
    top = v00 * (1.0 - wx) + v01 * wx
    bot = v10 * (1.0 - wx) + v11 * wx
    return top * (1.0 - wy) + bot * wy


def pack_bilinear_2d(img: jax.Array) -> jax.Array:
    """Pre-pack 2x2 neighborhoods into channels: out[y, x] =
    [img[y,x], img[y,x+1], img[y+1,x], img[y+1,x+1]] with edge replication.

    Turns a bilinear sample from 4 gather rows into 1 gather row of 4C
    channels — on gather-row-throughput-bound TPUs this is ~4x fewer gather
    rows for 4x source memory (sources here are small).  Edge replication
    matches 'border' clamping; 'zeros' mode still works because the
    out-of-range taps are masked to zero by the sampler.
    """
    right = jnp.concatenate([img[..., :, 1:, :], img[..., :, -1:, :]], axis=-2)
    down = jnp.concatenate([img[..., 1:, :, :], img[..., -1:, :, :]], axis=-3)
    down_right = jnp.concatenate(
        [down[..., :, 1:, :], down[..., :, -1:, :]], axis=-2
    )
    return jnp.concatenate([img, right, down, down_right], axis=-1)


def grid_sample_2d_packed(
    packed: jax.Array,
    grid: jax.Array,
    padding_mode: str = "border",
) -> jax.Array:
    """Bilinear sample from a pack_bilinear_2d image: one gather per point.

    Exact semantics for both padding modes:
      * border: the continuous coordinate is clipped to [0, size-1] first —
        identical to clamping both taps (the edge-replicated pack covers the
        last row/column).
      * zeros: taps are taken at ``b = clip(floor(x), 0, size-2)`` and b+1
        with *tent* weights ``max(0, 1 - |x - tap|)`` — any true tap outside
        the image has zero tent weight, reproducing zero padding exactly.

    Args:
      packed: (H, W, 4C) from pack_bilinear_2d.
      grid: (..., 2) normalized [-1, 1] coordinates (same conventions as
        grid_sample_2d).
    Returns: (..., C).
    """
    H, W, _ = packed.shape
    return sample_2d_packed_pix(
        packed,
        _unnormalize(grid[..., 0], W),
        _unnormalize(grid[..., 1], H),
        padding_mode,
    )


def sample_2d_packed_pix(
    packed: jax.Array,
    x: jax.Array,
    y: jax.Array,
    padding_mode: str = "border",
) -> jax.Array:
    """grid_sample_2d_packed with continuous *index-space* coordinates.

    Callers that already have pixel coordinates (projection math emits
    ``img/z - 0.5``) skip the [-1,1] round-trip — two fewer full-size
    elementwise passes per coordinate on the hot encode path.

    Args: packed (H, W, 4C); x, y (...,) index-space coords. Returns (..., C).
    """
    H, W, C4 = packed.shape
    C = C4 // 4

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        bx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
        by = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    elif padding_mode == "zeros":
        bx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        by = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    else:
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")

    bxf = bx.astype(x.dtype)
    byf = by.astype(y.dtype)
    # Tent weights relative to the actual tap positions (b, b+1): for border
    # mode (coords pre-clipped) these reduce to the usual (1-w, w).
    wx1 = jnp.clip(1.0 - jnp.abs(x - (bxf + 1.0)), 0.0, 1.0)[..., None]
    wx0 = jnp.clip(1.0 - jnp.abs(x - bxf), 0.0, 1.0)[..., None]
    wy1 = jnp.clip(1.0 - jnp.abs(y - (byf + 1.0)), 0.0, 1.0)[..., None]
    wy0 = jnp.clip(1.0 - jnp.abs(y - byf), 0.0, 1.0)[..., None]
    wx0 = wx0.astype(packed.dtype)
    wx1 = wx1.astype(packed.dtype)
    wy0 = wy0.astype(packed.dtype)
    wy1 = wy1.astype(packed.dtype)

    rows = jnp.take(packed.reshape(H * W, C4), by * W + bx, axis=0, mode="clip")
    if _TENT == "stack":
        u = jnp.stack(
            [wx0 * wy0, wx1 * wy0, wx0 * wy1, wx1 * wy1], axis=-2
        )  # (..., 4, 1)
        taps = rows.reshape(*rows.shape[:-1], 4, C)
        return jnp.sum(taps * u, axis=-2)
    v00 = rows[..., 0 * C : 1 * C]
    v01 = rows[..., 1 * C : 2 * C]
    v10 = rows[..., 2 * C : 3 * C]
    v11 = rows[..., 3 * C : 4 * C]

    top = v00 * wx0 + v01 * wx1
    bot = v10 * wx0 + v11 * wx1
    return top * wy0 + bot * wy1


# Above ~460k rows the TPU gather row rate halves (measured cliff between
# 458,752 and 491,520 rows at every row width up to 30 MB tables —
# tools/microbench_gather_cliff.py).  Tables bigger than this are gathered
# via the x-parity-paired layout below: half the rows, double the width
# (row width is free), one cheap select after the fetch — measured 1.8x
# end-to-end on the LLFF-sized member-RGB fetch.
GATHER_ROW_CLIFF = 420_000


def pack_bilinear_2d_paired(img: jax.Array) -> jax.Array:
    """pack_bilinear_2d with adjacent x-anchors folded into one row.

    out[y, k] = concat(pack[y, 2k], pack[y, 2k+1]) — shape (H, W//2, 8C).
    Halves the gather-table row count (recovering the fast gather regime
    for tables past GATHER_ROW_CLIFF) at the same total bytes; the sampler
    selects the half by anchor parity after the fetch.  Requires even W.
    """
    H, W, C = img.shape[-3:]
    assert W % 2 == 0, f"paired pack needs even W, got {W}"
    packed = pack_bilinear_2d(img)
    return packed.reshape(*packed.shape[:-3], H, W // 2, 8 * C)


def sample_2d_paired_pix(
    packed2: jax.Array,
    x: jax.Array,
    y: jax.Array,
    padding_mode: str = "border",
) -> jax.Array:
    """sample_2d_packed_pix over a pack_bilinear_2d_paired table.

    Bit-identical taps and tent weights — only the row layout differs: the
    row at (y, x>>1) holds both the even and odd anchor's 2x2 patch, and
    the anchor's half is selected arithmetically by x&1 (measured cheaper
    than a second gather or a where on this toolchain).

    Args: packed2 (H, W//2, 8C); x, y (...,) index-space coords.
    Returns: (..., C).
    """
    H, W2, C8 = packed2.shape
    W = W2 * 2
    C = C8 // 8

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        bx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
        by = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
    elif padding_mode == "zeros":
        bx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        by = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
    else:
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")

    bxf = bx.astype(x.dtype)
    byf = by.astype(y.dtype)
    wx1 = jnp.clip(1.0 - jnp.abs(x - (bxf + 1.0)), 0.0, 1.0)[..., None]
    wx0 = jnp.clip(1.0 - jnp.abs(x - bxf), 0.0, 1.0)[..., None]
    wy1 = jnp.clip(1.0 - jnp.abs(y - (byf + 1.0)), 0.0, 1.0)[..., None]
    wy0 = jnp.clip(1.0 - jnp.abs(y - byf), 0.0, 1.0)[..., None]
    wx0 = wx0.astype(packed2.dtype)
    wx1 = wx1.astype(packed2.dtype)
    wy0 = wy0.astype(packed2.dtype)
    wy1 = wy1.astype(packed2.dtype)

    rows = jnp.take(
        packed2.reshape(H * W2, C8), by * W2 + (bx >> 1), axis=0
    , mode="clip")
    odd = (bx & 1).astype(packed2.dtype)[..., None]
    even = 1.0 - odd
    half = rows[..., : 4 * C] * even + rows[..., 4 * C :] * odd
    v00 = half[..., 0 * C : 1 * C]
    v01 = half[..., 1 * C : 2 * C]
    v10 = half[..., 2 * C : 3 * C]
    v11 = half[..., 3 * C : 4 * C]

    top = v00 * wx0 + v01 * wx1
    bot = v10 * wx0 + v11 * wx1
    return top * wy0 + bot * wy1


def pack_patch_2d(img: jax.Array, ps: int = 4) -> jax.Array:
    """Pre-pack ps x ps neighborhoods: out[y, x] = img[y+dy, x+dx] for
    dy, dx in row-major 0..ps-1, edge-replicated.

    One gather row then serves a whole *group* of nearby sample points (the
    b x b member rays of a bundle) — see gather_patch_bilinear.  On this
    gather-row-rate-bound chip that is ~K x fewer rows for K points/group.
    """
    H, W, C = img.shape[-3:]
    iy = jnp.arange(H)
    ix = jnp.arange(W)
    cols = []
    for dy in range(ps):
        ys = jnp.clip(iy + dy, 0, H - 1)
        row = jnp.take(img, ys, axis=-3, mode="clip")
        for dx in range(ps):
            xs = jnp.clip(ix + dx, 0, W - 1)
            cols.append(jnp.take(row, xs, axis=-2, mode="clip"))
    return jnp.concatenate(cols, axis=-1)


def pack_patch_2d_slices(img: jax.Array, ps: int) -> jax.Array:
    """pack_patch_2d with slice+edge-concat shifts instead of arange takes.

    Identical layout and clamping; every shifted view is a static slice
    plus edge replication, which XLA fuses into the single table write
    (the take-with-iota form lowers as real row gathers).
    """

    def shift(t, d, axis):
        # out[k] = t[clamp(k + d)], d >= 0.
        if d == 0:
            return t
        idx = [slice(None)] * t.ndim
        edge = [slice(None)] * t.ndim
        idx[axis] = slice(d, None)
        edge[axis] = slice(-1, None)
        return jnp.concatenate([t[tuple(idx)]] + [t[tuple(edge)]] * d, axis=axis)

    cols = []
    for dy in range(ps):
        row = shift(img, dy, -3)
        for dx in range(ps):
            cols.append(shift(row, dx, -2))
    return jnp.concatenate(cols, axis=-1)


def gather_patch_bilinear_flat(
    packed: jax.Array, coords: jax.Array, ps: int
) -> jax.Array:
    """``gather_patch_bilinear`` with an unrolled slice-FMA combine.

    Same anchor/clamp semantics, but the bilinear reconstruction stays in
    the gathered row's wide-lane layout: per member, the x-axis tents are
    applied to ps C-lane slices of the row and the y-axis tents to the ps
    partial rows — 42 fused vector FMAs at ps=6 — with NO einsum and NO
    (..., K, ps, C) narrow-minor intermediates (the round-2 patch fetch
    lost 46 ms to exactly those: einsum materialized (..., 4, 4, 3) buffers
    tile-padded ~42x, PERF.md).  Returns (..., K*C) with members flattened
    into lanes; reshape to (..., K, C) is row-major identical.
    """
    H, W, Cpp = packed.shape
    C = Cpp // (ps * ps)
    K = coords.shape[-2]
    x = jnp.clip(coords[..., 0], 0.0, W - 1.0)  # (..., K)
    y = jnp.clip(coords[..., 1], 0.0, H - 1.0)
    ax = jnp.clip(jnp.floor(jnp.min(x, axis=-1)).astype(jnp.int32), 0, W - 1)
    ay = jnp.clip(jnp.floor(jnp.min(y, axis=-1)).astype(jnp.int32), 0, H - 1)

    rows = jnp.take(packed.reshape(H * W, Cpp), ay * W + ax, axis=0, mode="clip")

    axf = ax.astype(x.dtype)
    ayf = ay.astype(y.dtype)
    outs = []
    for k in range(K):
        lx = jnp.clip(x[..., k] - axf, 0.0, ps - 1.0)  # (...,)
        ly = jnp.clip(y[..., k] - ayf, 0.0, ps - 1.0)
        acc = None
        for i in range(ps):
            wy = jnp.clip(1.0 - jnp.abs(ly - float(i)), 0.0, 1.0)
            row_i = None
            for j in range(ps):
                wx = jnp.clip(1.0 - jnp.abs(lx - float(j)), 0.0, 1.0)
                term = rows[
                    ..., (i * ps + j) * C : (i * ps + j + 1) * C
                ] * wx[..., None].astype(packed.dtype)
                row_i = term if row_i is None else row_i + term
            term = row_i * wy[..., None].astype(packed.dtype)
            acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.concatenate(outs, axis=-1)  # (..., K*C)


def gather_patch_bilinear(
    packed: jax.Array, coords: jax.Array, ps: int = 4
) -> jax.Array:
    """Bilinear-sample a GROUP of nearby points from ONE patch gather row.

    Args:
      packed: (H, W, ps*ps*C) from pack_patch_2d.
      coords: (..., K, 2) continuous index-space coordinates (x, y) — i.e.
        pixel coordinate minus 0.5 — of K nearby points sharing one patch.
        'border' padding semantics (coordinates are clipped first).

    Returns:
      (..., K, C) bilinear samples.

    The patch is anchored at floor(min over the group); tent weights over
    the ps patch positions reproduce bilinear interpolation EXACTLY whenever
    each point's 2-texel footprint lies inside the patch (group spread
    <= ps-2 texels — the typical case for b x b member rays that are ~1 px
    apart in the source view).  Points that overflow are clamped to the
    patch edge, i.e. degrade to nearest-in-patch — bounded, not garbage.
    """
    H, W, Cpp = packed.shape
    C = Cpp // (ps * ps)
    x = jnp.clip(coords[..., 0], 0.0, W - 1.0)  # (..., K)
    y = jnp.clip(coords[..., 1], 0.0, H - 1.0)
    ax = jnp.clip(jnp.floor(jnp.min(x, axis=-1)).astype(jnp.int32), 0, W - 1)
    ay = jnp.clip(jnp.floor(jnp.min(y, axis=-1)).astype(jnp.int32), 0, H - 1)

    rows = jnp.take(packed.reshape(H * W, Cpp), ay * W + ax, axis=0, mode="clip")
    patch = rows.reshape(*rows.shape[:-1], ps, ps, C)

    lx = jnp.clip(x - ax[..., None].astype(x.dtype), 0.0, ps - 1.0)  # (..., K)
    ly = jnp.clip(y - ay[..., None].astype(y.dtype), 0.0, ps - 1.0)
    pos = jnp.arange(ps, dtype=x.dtype)
    wx = jnp.clip(1.0 - jnp.abs(lx[..., None] - pos), 0.0, 1.0)  # (..., K, ps)
    wy = jnp.clip(1.0 - jnp.abs(ly[..., None] - pos), 0.0, 1.0)
    wx = wx.astype(packed.dtype)
    wy = wy.astype(packed.dtype)

    # (..., K, ps) x (..., ps_y, ps_x, C) -> contract y then x.  HIGHEST
    # precision: these contractions ARE the bilinear warp interpolation
    # (CLAUDE.md geometry rule — default TPU matmul precision truncates
    # fp32 operands to bf16 inside the dot).
    hi = jax.lax.Precision.HIGHEST
    py = jnp.einsum("...ky,...yxc->...kxc", wy, patch, precision=hi)
    return jnp.einsum("...kx,...kxc->...kc", wx, py, precision=hi)


def pack_trilinear_3d(vol: jax.Array) -> jax.Array:
    """2x2x2 neighborhood pack for volumes: (D, H, W, C) -> (D, H, W, 8C),
    ordering [z0y0x0, z0y0x1, z0y1x0, z0y1x1, z1y0x0, ...]."""
    def shift_x(v):
        return jnp.concatenate([v[..., :, :, 1:, :], v[..., :, :, -1:, :]], axis=-2)

    def shift_y(v):
        return jnp.concatenate([v[..., :, 1:, :, :], v[..., :, -1:, :, :]], axis=-3)

    def shift_z(v):
        return jnp.concatenate([v[..., 1:, :, :, :], v[..., -1:, :, :, :]], axis=-4)

    z0 = [vol, shift_x(vol), shift_y(vol), shift_x(shift_y(vol))]
    vz = shift_z(vol)
    z1 = [vz, shift_x(vz), shift_y(vz), shift_x(shift_y(vz))]
    return jnp.concatenate(z0 + z1, axis=-1)


def grid_sample_3d_packed(
    packed: jax.Array,
    grid: jax.Array,
    padding_mode: str = "border",
) -> jax.Array:
    """Trilinear sample from a pack_trilinear_3d volume: 1 gather per point.

    Same exact-semantics strategy as grid_sample_2d_packed (clip coords for
    border, tent weights for zeros).

    Args: packed (D, H, W, 8C); grid (..., 3) xyz normalized. Returns (..., C).
    """
    D, H, W, C8 = packed.shape
    C = C8 // 8
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)
    z = _unnormalize(grid[..., 2], D)

    if padding_mode == "border":
        x = jnp.clip(x, 0.0, W - 1.0)
        y = jnp.clip(y, 0.0, H - 1.0)
        z = jnp.clip(z, 0.0, D - 1.0)
        bx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 1)
        by = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 1)
        bz = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, D - 1)
    elif padding_mode == "zeros":
        bx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, W - 2)
        by = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, H - 2)
        bz = jnp.clip(jnp.floor(z).astype(jnp.int32), 0, D - 2)
    else:
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")

    def tents(c, b):
        bf = b.astype(c.dtype)
        w0 = jnp.clip(1.0 - jnp.abs(c - bf), 0.0, 1.0)[..., None]
        w1 = jnp.clip(1.0 - jnp.abs(c - (bf + 1.0)), 0.0, 1.0)[..., None]
        return w0.astype(packed.dtype), w1.astype(packed.dtype)

    wx0, wx1 = tents(x, bx)
    wy0, wy1 = tents(y, by)
    wz0, wz1 = tents(z, bz)

    rows = jnp.take(
        packed.reshape(D * H * W, C8), (bz * H + by) * W + bx, axis=0
    , mode="clip")
    v = [rows[..., i * C : (i + 1) * C] for i in range(8)]

    c00 = v[0] * wx0 + v[1] * wx1
    c01 = v[2] * wx0 + v[3] * wx1
    c10 = v[4] * wx0 + v[5] * wx1
    c11 = v[6] * wx0 + v[7] * wx1
    c0 = c00 * wy0 + c01 * wy1
    c1 = c10 * wy0 + c11 * wy1
    return c0 * wz0 + c1 * wz1


def _gather_3d(vol: jax.Array, iz: jax.Array, iy: jax.Array, ix: jax.Array) -> jax.Array:
    D, H, W, _ = vol.shape
    flat = vol.reshape(D * H * W, -1)
    idx = (iz * H + iy) * W + ix
    return jnp.take(flat, idx, axis=0, mode="clip")


def grid_sample_3d(
    vol: jax.Array,
    grid: jax.Array,
    padding_mode: str = "border",
) -> jax.Array:
    """Trilinear sample of a 3D volume at normalized grid locations.

    Args:
      vol: (D, H, W, C) feature volume.
      grid: (..., 3) normalized coordinates; ``grid[..., 0]`` is x (width,
        i.e. W axis), ``grid[..., 1]`` is y (H axis), ``grid[..., 2]`` is z
        (depth, D axis) — the torch `grid_sample` xyz ordering the reference
        relies on for its (u, v, d) cost-volume lookups.
      padding_mode: 'border' or 'zeros'.

    Returns:
      (..., C) sampled features.
    """
    D, H, W, C = vol.shape
    x = _unnormalize(grid[..., 0], W)
    y = _unnormalize(grid[..., 1], H)
    z = _unnormalize(grid[..., 2], D)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    z0 = jnp.floor(z)
    wx = (x - x0)[..., None].astype(vol.dtype)
    wy = (y - y0)[..., None].astype(vol.dtype)
    wz = (z - z0)[..., None].astype(vol.dtype)

    x0i, y0i, z0i = (v.astype(jnp.int32) for v in (x0, y0, z0))
    x1i, y1i, z1i = x0i + 1, y0i + 1, z0i + 1

    x0c, x1c = jnp.clip(x0i, 0, W - 1), jnp.clip(x1i, 0, W - 1)
    y0c, y1c = jnp.clip(y0i, 0, H - 1), jnp.clip(y1i, 0, H - 1)
    z0c, z1c = jnp.clip(z0i, 0, D - 1), jnp.clip(z1i, 0, D - 1)

    def masked(iz, iy, ix, izr, iyr, ixr):
        v = _gather_3d(vol, iz, iy, ix)
        if padding_mode == "zeros":
            ok = (
                (izr >= 0) & (izr < D) & (iyr >= 0) & (iyr < H) & (ixr >= 0) & (ixr < W)
            ).astype(vol.dtype)[..., None]
            v = v * ok
        return v

    if padding_mode not in ("border", "zeros"):
        raise ValueError(f"Unsupported padding_mode: {padding_mode}")

    v000 = masked(z0c, y0c, x0c, z0i, y0i, x0i)
    v001 = masked(z0c, y0c, x1c, z0i, y0i, x1i)
    v010 = masked(z0c, y1c, x0c, z0i, y1i, x0i)
    v011 = masked(z0c, y1c, x1c, z0i, y1i, x1i)
    v100 = masked(z1c, y0c, x0c, z1i, y0i, x0i)
    v101 = masked(z1c, y0c, x1c, z1i, y0i, x1i)
    v110 = masked(z1c, y1c, x0c, z1i, y1i, x0i)
    v111 = masked(z1c, y1c, x1c, z1i, y1i, x1i)

    c00 = v000 * (1 - wx) + v001 * wx
    c01 = v010 * (1 - wx) + v011 * wx
    c10 = v100 * (1 - wx) + v101 * wx
    c11 = v110 * (1 - wx) + v111 * wx
    c0 = c00 * (1 - wy) + c01 * wy
    c1 = c10 * (1 - wy) + c11 * wy
    return c0 * (1 - wz) + c1 * wz
