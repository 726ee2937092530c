"""A/B restructurings of the packed mip fetch (the frame's fattest marginal
cost: ~14.8 ms of the 58.6 ms fused frame per tools/ablate_frame.py, vs a
~5.9 ms row floor).

Variants (all numerically equivalent; asserted):
  cur      ops/mip.py::mip_texture_fetch_packed as shipped (per-tap shifts,
           clip, floor; two jnp.take calls)
  shared   shared coordinate math: the level scale via exp2(-l), base
           uv*W0 computed once, ceil-tap scale = floor-tap/2 (with
           max-level clamp), closed-form offsets in float int-exact space
  onegather  both taps' indices stacked into ONE jnp.take of 2N rows
  bf16w    tent/bilinear weights computed in bf16 end to end

Usage: python tools/microbench_mip.py [--samples N]
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from microbench import chain_time  # noqa: E402


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 320])
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--feat", type=int, default=19)
    ap.add_argument("--views", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gdb_nerf_tpu.ops import mip

    Hb, Wb = args.hw
    S, F, V = args.samples, args.feat, args.views
    L = 3
    key = jax.random.PRNGKey(0)
    img_feat = jax.random.uniform(key, (V, Hb, Wb, F)).astype(jnp.bfloat16)
    packed, offs = jax.jit(
        lambda f: mip.pack_pyramid(mip.build_pyramid(f, L))
    )(img_feat)
    uv = jax.random.uniform(jax.random.PRNGKey(1), (V, Hb, Wb, S, 2))
    lod = jax.random.uniform(jax.random.PRNGKey(2), (V, Hb, Wb, S)) * L
    print(
        f"device: {jax.devices()[0]}  {Hb}x{Wb} S={S} V={V} F={F} "
        f"rows/call={V * Hb * Wb * S * 2 / 1e6:.2f} M",
        flush=True,
    )

    T0 = Hb * Wb
    C = F

    def fetch_cur(p):
        return sum(
            mip.mip_texture_fetch_packed(
                p[v], offs, (Hb, Wb), uv[v], lod[v], L
            ).mean()
            for v in range(V)
        )

    def shared_impl(packed_v, uv_v, lod_v, one_gather=False, w_bf16=False):
        lodc = jnp.clip(lod_v, 0.0, float(L))
        l0 = jnp.floor(lodc)
        frac = (lodc - l0)[..., None]
        # ceil level: l0+1 clamped to L -> its scale is s0/2 unless clamped.
        s0 = jnp.exp2(-l0)
        at_max = l0 >= float(L)
        s1 = jnp.where(at_max, s0, s0 * 0.5)

        xc = uv_v[..., 0] * Wb  # shared across taps
        yc = uv_v[..., 1] * Hb

        flat = packed_v

        def tap(s):
            Wl = Wb * s
            Hl = Hb * s
            # off = 4*(T0 - T0*s^2)/3, int-exact: T0*s^2 and the /3 result
            # are integers < 2^24 whenever Hb, Wb divide by 2^L.
            off = jnp.round((4.0 / 3.0) * (T0 - T0 * s * s)).astype(jnp.int32)
            x = jnp.clip(xc * s - 0.5, 0.0, Wl - 1.0)
            y = jnp.clip(yc * s - 0.5, 0.0, Hl - 1.0)
            bx = jnp.floor(x)
            by = jnp.floor(y)
            wx = x - bx
            wy = y - by
            bxi = jnp.clip(bx.astype(jnp.int32), 0, (Wl - 1.0).astype(jnp.int32))
            byi = jnp.clip(by.astype(jnp.int32), 0, (Hl - 1.0).astype(jnp.int32))
            idx = off + byi * Wl.astype(jnp.int32) + bxi
            return idx, wx[..., None], wy[..., None]

        i0, wx0, wy0 = tap(s0)
        i1, wx1, wy1 = tap(s1)

        def blend(rows, wx, wy):
            wdt = rows.dtype if w_bf16 else jnp.float32
            wx = wx.astype(wdt)
            wy = wy.astype(wdt)
            v00 = rows[..., 0 * C : 1 * C]
            v01 = rows[..., 1 * C : 2 * C]
            v10 = rows[..., 2 * C : 3 * C]
            v11 = rows[..., 3 * C : 4 * C]
            top = v00 + (v01 - v00) * wx
            bot = v10 + (v11 - v10) * wx
            return top + (bot - top) * wy

        if one_gather:
            both = jnp.take(flat, jnp.stack([i0, i1]), axis=0)
            a = blend(both[0], wx0, wy0)
            b = blend(both[1], wx1, wy1)
        else:
            a = blend(jnp.take(flat, i0, axis=0), wx0, wy0)
            b = blend(jnp.take(flat, i1, axis=0), wx1, wy1)
        frac = frac.astype(a.dtype)
        return a + (b - a) * frac

    def fetch_shared(p):
        return sum(
            shared_impl(p[v], uv[v], lod[v]).mean() for v in range(V)
        )

    def fetch_onegather(p):
        return sum(
            shared_impl(p[v], uv[v], lod[v], one_gather=True).mean()
            for v in range(V)
        )

    def fetch_bf16w(p):
        return sum(
            shared_impl(p[v], uv[v], lod[v], w_bf16=True).mean()
            for v in range(V)
        )

    variants = {
        "cur": fetch_cur,
        "shared": fetch_shared,
        "onegather": fetch_onegather,
        "bf16w": fetch_bf16w,
    }

    # Correctness: full-tensor comparison on view 0.
    ref = np.asarray(
        jax.jit(
            lambda p: mip.mip_texture_fetch_packed(
                p[0], offs, (Hb, Wb), uv[0], lod[0], L
            )
        )(packed),
        np.float32,
    )
    for kw in ({}, {"one_gather": True}, {"w_bf16": True}):
        got = np.asarray(
            jax.jit(lambda p: shared_impl(p[0], uv[0], lod[0], **kw))(packed),
            np.float32,
        )
        err = abs(got - ref).max()
        assert err < 0.05, (kw, err)  # bf16 rounding differences only

    for name, f in variants.items():
        ms = chain_time(jax.jit(f), packed, iters=6)
        rows = V * Hb * Wb * S * 2
        print(
            f"  {name:10s} {ms:8.2f} ms  ({rows / (ms / 1000) / 1e6:6.0f} M rows/s)",
            flush=True,
        )


if __name__ == "__main__":
    main()
