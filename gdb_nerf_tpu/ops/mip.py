"""Mipmapped texture sampling — pure-JAX replacement for nvdiffrast.texture.

The reference fetches anti-aliased source features with
``nvdiffrast.torch.texture(..., mip_level_bias=levels,
boundary_mode='clamp', max_mip_level=L)``
(/root/reference/networks/gdb_nerf/bundle_sampler.py:355-359): a mip pyramid
built by 2×2 box downsampling, bilinear taps at the two adjacent levels, and
a linear blend by the fractional LOD.

This module reproduces those semantics with static shapes:

  * ``build_pyramid`` precomputes all levels with 2×2 average pooling.
  * ``mip_texture_fetch`` samples *every* level bilinearly and combines them
    with tent weights ``max(0, 1 - |lod - l|)`` — mathematically identical
    to floor/ceil trilinear filtering, but branch-free and fully vectorized
    (max_mip_level is 3, so this is 4 cheap gathers on small maps).

Texture coordinates follow the nvdiffrast convention: uv in [0, 1] with
texel centers at ``(i + 0.5) / size`` (so the sample point is
``uv * size - 0.5`` in texel units) and clamped boundaries.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp

# Read at trace time so tools/ab_frame.py can flip grid_sample._TENT
# between traces (import-time copies would freeze the A value).
from gdb_nerf_tpu.ops import grid_sample as _gs

# Level-pair packed mip table (pack_pyramid_pair + mip_texture_fetch_pair):
# ONE gather row per (sample, view) carries BOTH trilinear levels — the
# child's 2x2 patch and the ceil level's covering 3x3 patch — halving the
# fetch's gather-row count on this row-rate-bound chip (the mip fetch's DCE
# marginal was 14.8 ms vs a ~5.9 ms row floor, PERF.md).  Rows widen
# 4C=76 -> 13C=247 lanes, i.e. the padded row goes 128 -> 256 lanes: the
# same physical gather bytes for half the rows.  A/B via
# tools/ab_frame.py --flag mip_pair before changing the default.
_PAIR = os.environ.get("GDBN_MIP_PAIR", "0") == "1"

# Static level-0 mip fetch (GDBN_MIP_L0): when the measured LOD population
# of a protocol sits at lod <= 0 everywhere (tools/measure_lod.py), the
# ceil-level tap has weight exactly 0 and the floor tap is level 0 at scale
# 1 — so ONE bilinear tap from the level-0 rows of the packed pyramid is
# bit-exact, and the entire per-sample LOD chain (sphere-projection radius,
# log2, exp2 level scales, second tap + its index math, frac blend) plus
# the ball-radius producer in the sampler become dead code.  This is the
# "remove work outright" class (PERF.md model v3).  EXACTNESS IS
# DATA-DEPENDENT: only enable for configs whose LOD histogram shows
# raw_max <= 0 with margin; tools/ab_frame.py --flag mip_l0 prints the
# |off-on| residual on the bench scene as the check.
_L0 = os.environ.get("GDBN_MIP_L0", "0") == "1"

# Static level-(0,1) mip fetch (GDBN_MIP_01): EXACT whenever the LOD
# population sits strictly below 1 (tools/measure_lod.py: every protocol
# measures lod in [-0.011, +0.024] — a source view would need to be
# sampled at half the target's density to reach lod 1, which the
# nearest-camera view selection precludes).  floor(clip(lod)) is then
# statically 0 and the ceil level statically 1, so the per-sample
# exp2/where/round/dynamic-offset chains of the general packed fetch are
# dead; both taps remain, with frac = clip(lod, 0, 1) (for lod <= 0 the
# clip gives frac exactly 0 — the blend reduces to the level-0 tap
# bit-exactly).  The pyramid also only needs levels 0..1.
_01 = os.environ.get("GDBN_MIP_01", "0") == "1"


def mip_texture_fetch_01(packed: jax.Array, base_hw: tuple[int, int],
                         uv: jax.Array, lod: jax.Array) -> jax.Array:
    """Two-tap trilinear fetch with levels pinned statically to (0, 1).

    Bit-identical to ``mip_texture_fetch_packed`` for any lod < 1 (see the
    _01 comment above); the packed table needs levels 0 and 1 only."""
    H0, W0 = base_hw
    C = packed.shape[-1] // 4
    frac = jnp.clip(lod, 0.0, 1.0)[..., None]

    def tap(Hl, Wl, off):
        # Static per-level sizes (Python ints).  Coordinate arithmetic is
        # bit-identical to the general path's x = (uv*W0)*s - 0.5 with
        # s = exp2(-l0f) in {1, 0.5}: scaling by a power of two is exact,
        # so uv*Wl rounds the same.
        x = jnp.clip(uv[..., 0] * Wl - 0.5, 0.0, Wl - 1.0)
        y = jnp.clip(uv[..., 1] * Hl - 0.5, 0.0, Hl - 1.0)
        bx = jnp.floor(x)
        by = jnp.floor(y)
        wx = (x - bx)[..., None].astype(packed.dtype)
        wy = (y - by)[..., None].astype(packed.dtype)
        idx = off + by.astype(jnp.int32) * Wl + bx.astype(jnp.int32)
        rows = jnp.take(packed, idx, axis=0, mode="clip")
        v00 = rows[..., 0 * C : 1 * C]
        v01 = rows[..., 1 * C : 2 * C]
        v10 = rows[..., 2 * C : 3 * C]
        v11 = rows[..., 3 * C : 4 * C]
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    a = tap(H0, W0, 0)
    b = tap(H0 // 2, W0 // 2, H0 * W0)  # level 1 starts at T0
    frac = frac.astype(a.dtype)
    return a * (1 - frac) + b * frac


def mip_texture_fetch_l0(packed: jax.Array, base_hw: tuple[int, int],
                         uv: jax.Array) -> jax.Array:
    """Single level-0 bilinear tap from a pack_pyramid table.

    Identical to ``mip_texture_fetch_packed`` with lod pinned to 0 (see
    the _L0 comment above for when that is exact): level-0 rows sit at
    offset 0 with scale 1, so the fetch is a plain clamped bilinear on the
    2x2-packed rows."""
    H0, W0 = base_hw
    C = packed.shape[-1] // 4
    x = jnp.clip(uv[..., 0] * W0 - 0.5, 0.0, W0 - 1.0)
    y = jnp.clip(uv[..., 1] * H0 - 0.5, 0.0, H0 - 1.0)
    bx = jnp.floor(x)
    by = jnp.floor(y)
    wx = (x - bx)[..., None].astype(packed.dtype)
    wy = (y - by)[..., None].astype(packed.dtype)
    idx = by.astype(jnp.int32) * W0 + bx.astype(jnp.int32)
    rows = jnp.take(packed, idx, axis=0, mode="clip")
    v00 = rows[..., 0 * C : 1 * C]
    v01 = rows[..., 1 * C : 2 * C]
    v10 = rows[..., 2 * C : 3 * C]
    v11 = rows[..., 3 * C : 4 * C]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def build_pyramid(img: jax.Array, max_level: int) -> list[jax.Array]:
    """Build a box-filter mip pyramid.

    Args:
      img: (..., H, W, C) base texture; H and W must be divisible by
        2**max_level.
      max_level: number of reduction levels.

    Returns:
      List of max_level+1 arrays, level 0 being ``img`` itself.
    """
    levels = [img]
    cur = img
    for _ in range(max_level):
        *lead, H, W, C = cur.shape
        cur = cur.reshape(*lead, H // 2, 2, W // 2, 2, C).mean(axis=(-4, -2))
        levels.append(cur)
    return levels


def _bilinear_clamp(tex: jax.Array, uv: jax.Array) -> jax.Array:
    """Bilinear fetch with clamped boundary; uv in [0,1], texel centers at
    (i+0.5)/size."""
    H, W, C = tex.shape
    x = uv[..., 0] * W - 0.5
    y = uv[..., 1] * H - 0.5
    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    wx = (x - x0)[..., None]
    wy = (y - y0)[..., None]
    x0i = jnp.clip(x0.astype(jnp.int32), 0, W - 1)
    x1i = jnp.clip(x0.astype(jnp.int32) + 1, 0, W - 1)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, H - 1)
    y1i = jnp.clip(y0.astype(jnp.int32) + 1, 0, H - 1)

    flat = tex.reshape(H * W, C)
    v00 = jnp.take(flat, y0i * W + x0i, axis=0, mode="clip")
    v01 = jnp.take(flat, y0i * W + x1i, axis=0, mode="clip")
    v10 = jnp.take(flat, y1i * W + x0i, axis=0, mode="clip")
    v11 = jnp.take(flat, y1i * W + x1i, axis=0, mode="clip")
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    return top * (1 - wy) + bot * wy


def pack_pyramid(levels: list[jax.Array]):
    """Patch-pack each level (2x2 neighborhoods -> 4C channels) and flatten
    the pyramid into one (..., total_texels, 4C) buffer.

    Returns (packed, offsets) where ``offsets[l]`` is the flat index of
    level l's first texel — the fetch below then costs ONE gather row per
    (sample, level): 2 rows per sample for floor+ceil trilinear filtering,
    vs 16 taps for the naive 4-level tent fetch.
    """
    import numpy as np

    from gdb_nerf_tpu.ops.grid_sample import pack_bilinear_2d

    plevels = [pack_bilinear_2d(l) for l in levels]
    flat = [l.reshape(*l.shape[:-3], -1, l.shape[-1]) for l in plevels]
    packed = jnp.concatenate(flat, axis=-2)
    sizes = [l.shape[-3] * l.shape[-2] for l in levels]
    offsets = jnp.asarray(np.cumsum([0] + sizes[:-1]), jnp.int32)
    return packed, offsets


def build_pack_pyramid(feat: jax.Array, rgb: jax.Array, max_level: int):
    """Fused pyramid build + 4C pack with dense-lane intermediates.

    Produces exactly ``pack_pyramid(build_pyramid(concat([feat, rgb], -1),
    max_level))`` but never materializes a (..., H, W, C) level tensor:
    the (..., 19)-channel bf16 intermediates of the naive chain pad to 128
    lanes on TPU (~6.7x physical traffic), which made the build+pack chain
    ~9 ms of the 50.5 ms DTU frame (tools/ablate_frame.py ``mippack``
    knock) vs a ~4 ms table-write floor.  Here every intermediate level
    lives in merged ``(..., H_l, W_l * C)`` dense-lane form; the padded
    write happens once per level, at the (T_l, 4C) gather table the fetch
    actually needs.

    Level 0's pack reads ``feat`` and ``rgb`` directly through an 8-way
    concat (channel order [f, r, f_r, r_r, f_d, r_d, f_dr, r_dr] ==
    pack_bilinear_2d of the concat), and level 1's merged form is derived
    from ``feat``/``rgb`` in the same fused pass — the 19-channel level-0
    concat of the naive chain never exists.

    Args:
      feat: (..., H, W, F) source features at bundle resolution.
      rgb: (..., H, W, Crgb) resized source RGB.
      max_level: reduction levels; H and W must divide 2**max_level.

    Returns:
      (packed, offsets) — identical contract to ``pack_pyramid``:
      packed (..., T, 4C) with T = sum of level texel counts, offsets
      (max_level+1,) int32 flat index of each level's first texel.
    """
    import numpy as np

    *lead, H, W, F = feat.shape
    C = F + rgb.shape[-1]
    assert H % (1 << max_level) == 0 and W % (1 << max_level) == 0

    def shift_right(t):
        return jnp.concatenate([t[..., :, 1:, :], t[..., :, -1:, :]], axis=-2)

    def shift_down(t):
        return jnp.concatenate([t[..., 1:, :, :], t[..., -1:, :, :]], axis=-3)

    def flat(p):
        return p.reshape(*lead, -1, p.shape[-1])

    # Level 0 pack: 8-way concat reading feat/rgb directly.
    fr, rr = shift_right(feat), shift_right(rgb)
    fd, rd = shift_down(feat), shift_down(rgb)
    fdr, rdr = shift_right(fd), shift_right(rd)
    packs = [
        jnp.concatenate([feat, rgb, fr, rr, fd, rd, fdr, rdr], axis=-1)
    ]

    def avg_pool_merged(t, Hl, Wl):
        """(..., Hl, Wl, C) view -> next level in merged dense form."""
        mm = t.reshape(*lead, Hl, Wl // 2, 2 * C)
        xa = (mm[..., :C] + mm[..., C:]) * 0.5
        ya = (xa[..., 0::2, :, :] + xa[..., 1::2, :, :]) * 0.5
        return ya.reshape(*lead, Hl // 2, (Wl // 2) * C)

    # Level 1 merged, derived straight from feat/rgb (fused 2x2 means).
    def avg22(t):
        *ld, Hl, Wl, Ct = t.shape
        return t.reshape(*ld, Hl // 2, 2, Wl // 2, 2, Ct).mean(axis=(-4, -2))

    if max_level >= 1:
        m = jnp.concatenate([avg22(feat), avg22(rgb)], axis=-1).reshape(
            *lead, H // 2, (W // 2) * C
        )
        Hl, Wl = H // 2, W // 2
        for l in range(1, max_level + 1):
            t = m.reshape(*lead, Hl, Wl, C)
            td = shift_down(t)
            packs.append(
                jnp.concatenate(
                    [t, shift_right(t), td, shift_right(td)], axis=-1
                )
            )
            if l < max_level:
                m = avg_pool_merged(t, Hl, Wl)
                Hl, Wl = Hl // 2, Wl // 2

    packed = jnp.concatenate([flat(p) for p in packs], axis=-2)
    sizes = [(H >> l) * (W >> l) for l in range(max_level)]
    offsets = jnp.asarray(np.cumsum([0] + sizes), jnp.int32)
    return packed, offsets


def pack_pyramid_pair(levels: list[jax.Array]):
    """Level-pair packing: one gather row serves BOTH trilinear mip levels.

    The row for texel (l, y, x) is ``[child 2x2 patch (4C) | parent 3x3
    patch (9C)]`` where the parent patch is level l+1 anchored at
    ``(y//2 - 1, x//2 - 1)`` with edge clamp.  The 3x3 extent covers every
    parent 2x2 footprint reachable from a sample whose floor tap lands on
    child texel (y, x): with continuous child coord x_c in [bx, bx+1) the
    parent coord is x_c/2 - 0.25, whose floor is bx//2 - 1 or bx//2 (even
    bx) / exactly bx//2 (odd bx) — always inside the anchored 3x3.  The top
    level's parent slots are zeros: lod is clamped to max_level, so its
    floor tap can only be the top level when frac == 0 exactly and the
    parent contribution is multiplied by zero.

    Returns (packed, offsets) with packed (..., T, 13C) — same offsets
    contract as ``pack_pyramid``.
    """
    import numpy as np

    from gdb_nerf_tpu.ops.grid_sample import pack_bilinear_2d

    def shift(t, d, axis):
        # out[k] = t[clamp(k + d)] along axis (edge replication).
        if d == 0:
            return t
        idx = [slice(None)] * t.ndim
        edge = [slice(None)] * t.ndim
        if d > 0:
            idx[axis] = slice(d, None)
            edge[axis] = slice(-1, None)
            parts = [t[tuple(idx)]] + [t[tuple(edge)]] * d
        else:
            idx[axis] = slice(None, d)
            edge[axis] = slice(None, 1)
            parts = [t[tuple(edge)]] * (-d) + [t[tuple(idx)]]
        return jnp.concatenate(parts, axis=axis)

    L = len(levels) - 1
    rows = []
    for l, lev in enumerate(levels):
        child = pack_bilinear_2d(lev)  # (..., H_l, W_l, 4C)
        if l < L:
            par = levels[l + 1]
            sh = []
            for dy in (-1, 0, 1):
                tdy = shift(par, dy, axis=-3)
                for dx in (-1, 0, 1):
                    sh.append(shift(tdy, dx, axis=-2))
            P = jnp.concatenate(sh, axis=-1)  # (..., Hp, Wp, 9C)
            # Child texel (y, x) reads P[y//2, x//2] (P[k] holds the patch
            # anchored at k-1): nearest 2x upsample.
            P = jnp.repeat(jnp.repeat(P, 2, axis=-3), 2, axis=-2)
        else:
            P = jnp.zeros(
                child.shape[:-1] + (9 * lev.shape[-1],), child.dtype
            )
        rows.append(jnp.concatenate([child, P], axis=-1))

    flat = [r.reshape(*r.shape[:-3], -1, r.shape[-1]) for r in rows]
    packed = jnp.concatenate(flat, axis=-2)
    sizes = [l.shape[-3] * l.shape[-2] for l in levels]
    offsets = jnp.asarray(np.cumsum([0] + sizes[:-1]), jnp.int32)
    return packed, offsets


def mip_texture_fetch_pair(
    packed: jax.Array,
    offsets: jax.Array,
    base_hw: tuple[int, int],
    uv: jax.Array,
    lod: jax.Array,
    max_level: int,
) -> jax.Array:
    """Trilinear fetch from a ``pack_pyramid_pair`` table: ONE gather row.

    Same clamp/tent semantics as ``mip_texture_fetch_packed`` (nvdiffrast
    mip_level_bias trilinear, /root/reference/networks/gdb_nerf/
    bundle_sampler.py:355-359); the ceil-level bilinear is reconstructed
    from the stored 3x3 parent patch with 3-tap tent weights per axis —
    algebraically the same two-point lerp, so results match the two-tap
    fetch to ulp-level f32 rounding.

    Args: identical to ``mip_texture_fetch_packed`` with packed (T, 13C);
    ``offsets`` is unused (the flat offset is the closed-form geometric
    series) but kept for interface symmetry.
    """
    del offsets
    H0, W0 = base_hw
    lod = jnp.clip(lod, 0.0, float(max_level))
    l0f = jnp.floor(lod)
    frac = (lod - l0f)[..., None]
    T, C13 = packed.shape
    C = C13 // 13
    T0 = H0 * W0
    assert H0 % (1 << max_level) == 0 and W0 % (1 << max_level) == 0, (
        base_hw,
        max_level,
    )

    s0 = jnp.exp2(-l0f)
    Wl = W0 * s0
    Hl = H0 * s0
    off = jnp.round((4.0 / 3.0) * (T0 - T0 * s0 * s0)).astype(jnp.int32)
    xc = uv[..., 0] * W0
    yc = uv[..., 1] * H0
    x = jnp.clip(xc * s0 - 0.5, 0.0, Wl - 1.0)
    y = jnp.clip(yc * s0 - 0.5, 0.0, Hl - 1.0)
    bx = jnp.floor(x)
    by = jnp.floor(y)
    wx = (x - bx)[..., None].astype(packed.dtype)
    wy = (y - by)[..., None].astype(packed.dtype)
    idx = off + by.astype(jnp.int32) * Wl.astype(jnp.int32) + bx.astype(
        jnp.int32
    )
    rows = jnp.take(packed, idx, axis=0, mode="clip")  # (..., 13C)

    v00 = rows[..., 0 * C : 1 * C]
    v01 = rows[..., 1 * C : 2 * C]
    v10 = rows[..., 2 * C : 3 * C]
    v11 = rows[..., 3 * C : 4 * C]
    top = v00 * (1 - wx) + v01 * wx
    bot = v10 * (1 - wx) + v11 * wx
    child = top * (1 - wy) + bot * wy

    # Ceil-level coords (floor level's scale / 2, clamped at the top).
    s1 = jnp.where(l0f >= float(max_level), s0, s0 * 0.5)
    xp = jnp.clip(xc * s1 - 0.5, 0.0, W0 * s1 - 1.0)
    yp = jnp.clip(yc * s1 - 0.5, 0.0, H0 * s1 - 1.0)
    # Position inside the stored 3x3 patch (anchor = floor(b/2) - 1); the
    # pack docstring proves ax, ay land in [0, 2].
    ax = xp - (jnp.floor(bx * 0.5) - 1.0)
    ay = yp - (jnp.floor(by * 0.5) - 1.0)

    def tent3(a):
        return [
            jnp.maximum(0.0, 1.0 - jnp.abs(a - float(p)))[..., None].astype(
                packed.dtype
            )
            for p in range(3)
        ]

    wpx = tent3(ax)
    wpy = tent3(ay)
    parent = None
    for py in range(3):
        row_acc = None
        for px in range(3):
            sl = rows[..., (4 + py * 3 + px) * C : (5 + py * 3 + px) * C]
            term = sl * wpx[px]
            row_acc = term if row_acc is None else row_acc + term
        term = row_acc * wpy[py]
        parent = term if parent is None else parent + term

    frac = frac.astype(child.dtype)
    return child * (1 - frac) + parent * frac


def mip_texture_fetch_packed(
    packed: jax.Array,
    offsets: jax.Array,
    base_hw: tuple[int, int],
    uv: jax.Array,
    lod: jax.Array,
    max_level: int,
) -> jax.Array:
    """Trilinear fetch from a packed pyramid: floor + ceil level only.

    Equivalent to ``mip_texture_fetch`` (same clamp/tent semantics) but
    issues 8 gather taps per sample instead of 4*(levels) — the bandwidth
    matters on gather-bound TPUs.

    Args:
      packed: (T, 4C) patch-packed pyramid (single image; vmap for batches).
      offsets: (max_level+1,) flat offset of each level.
      base_hw: (H0, W0) of level 0.
      uv: (..., 2) in [0, 1]; lod: (...,) fractional level.
    """
    H0, W0 = base_hw
    lod = jnp.clip(lod, 0.0, float(max_level))
    l0f = jnp.floor(lod)
    frac = (lod - l0f)[..., None]

    T, C4 = packed.shape
    C = C4 // 4
    flat = packed
    T0 = H0 * W0
    closed_form = H0 % (1 << max_level) == 0 and W0 % (1 << max_level) == 0
    # build_pyramid requires divisibility, so levels halve exactly and the
    # float level-size/offset arithmetic below is int-exact.
    assert closed_form, (base_hw, max_level)

    # Shared-coordinate restructure (measured 14.9 -> 9.3 ms on the 1.47 M
    # row DTU-eval fetch, tools/microbench_mip.py): per-level sizes via one
    # exp2 of the float level — the ceil level's scale is floor/2 with the
    # max-level clamp — and the geometric-series flat offset 4*(T0 - T0*s^2)/3
    # computed in float (int-exact below 2^24 when the base divides 2^L).
    # The base uv*W products are computed once and reused by both taps.
    s0 = jnp.exp2(-l0f)
    s1 = jnp.where(l0f >= float(max_level), s0, s0 * 0.5)
    xc = uv[..., 0] * W0
    yc = uv[..., 1] * H0

    def taps(s):
        Wl = W0 * s
        Hl = H0 * s
        off = jnp.round((4.0 / 3.0) * (T0 - T0 * s * s)).astype(jnp.int32)
        # Clamp boundary == border mode: clip the continuous coordinate.
        x = jnp.clip(xc * s - 0.5, 0.0, Wl - 1.0)
        y = jnp.clip(yc * s - 0.5, 0.0, Hl - 1.0)
        bx = jnp.floor(x)
        by = jnp.floor(y)
        wx = (x - bx)[..., None].astype(packed.dtype)
        wy = (y - by)[..., None].astype(packed.dtype)
        idx = off + by.astype(jnp.int32) * Wl.astype(jnp.int32) + bx.astype(
            jnp.int32
        )
        rows = jnp.take(flat, idx, axis=0, mode="clip")
        if _gs._TENT == "stack":
            u = jnp.stack(
                [
                    (1 - wx) * (1 - wy),
                    wx * (1 - wy),
                    (1 - wx) * wy,
                    wx * wy,
                ],
                axis=-2,
            )  # (..., 4, 1)
            t4 = rows.reshape(*rows.shape[:-1], 4, C)
            return jnp.sum(t4 * u, axis=-2)
        v00 = rows[..., 0 * C : 1 * C]
        v01 = rows[..., 1 * C : 2 * C]
        v10 = rows[..., 2 * C : 3 * C]
        v11 = rows[..., 3 * C : 4 * C]
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    a = taps(s0)
    b = taps(s1)
    frac = frac.astype(a.dtype)
    return a * (1 - frac) + b * frac


def mip_texture_fetch(
    levels: list[jax.Array],
    uv: jax.Array,
    lod: jax.Array,
    max_level: int,
) -> jax.Array:
    """Trilinear (bilinear × mip-lerp) texture fetch at fractional LOD.

    Args:
      levels: pyramid from ``build_pyramid``; each (H_l, W_l, C).
      uv: (..., 2) coordinates in [0, 1].
      lod: (...,) fractional mip level, clamped to [0, max_level].
      max_level: highest usable level (static).

    Returns:
      (..., C) filtered texture values.
    """
    lod = jnp.clip(lod, 0.0, float(max_level))
    out = None
    for l in range(max_level + 1):
        w = jnp.maximum(0.0, 1.0 - jnp.abs(lod - float(l)))[..., None]
        tap = _bilinear_clamp(levels[l], uv)
        out = tap * w if out is None else out + tap * w
    return out
