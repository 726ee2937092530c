"""Probe TPU layout/lane-padding cost of the encode coordinate math.

Hypothesis: tensors shaped (H, W, S, bsq, 3) put tiny dims (4, 3) in the
minor (sublane, lane) positions, so every materialized intermediate is
lane-padded ~10-80x, making the elementwise coordinate math in
encode_samples far more expensive than its logical byte count.  The same
math in planar layout — coordinates as separate (S, H, W) or (bsq, S, H, W)
arrays with (H, W) minor — should run near the copy bandwidth.

Times three variants of the member-projection + tent-weight math at the
real eval shapes (H=W bundle grid 256x320, S=3, bsq=4, V=3):
  a) vector layout: img = img_c[:, :, :, None, :] + KRoff[:, :, None] * z
     over (H, W, S, bsq, 3) like ops/bundles.py::encode_samples today.
  b) planar layout: x/y/z as (bsq, S, H, W) with scalar affine coeffs.
  c) planar + gather: (b) plus the actual packed-row gather and tent combine.

Usage: python tools/microbench_layout.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from microbench import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    H, W, S, bsq, V = 256, 320, 3, 4, 3
    Hs, Ws = 512, 640
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    print(f"device: {jax.devices()[0]}  grid {H}x{W} S={S} bsq={bsq} V={V}", flush=True)

    # Shared inputs (per view).
    ccenter = jax.random.uniform(ks[0], (H, W, S, 3), jnp.float32, 1.0, 2.0)
    z = jax.random.uniform(ks[1], (H, W, S), jnp.float32, 0.5, 1.5)
    KRoff = jax.random.normal(ks[2], (H, W, bsq, 3), jnp.float32) * 0.01
    kroff_const = jax.random.normal(ks[3], (bsq, 3), jnp.float32) * 0.01
    packed = jax.random.normal(ks[4], (Hs * Ws, 12), jnp.bfloat16)

    # a) Vector layout (today's encode member math, minus the gather).
    def vec(ccenter, z, KRoff):
        img = ccenter[:, :, :, None, :] + KRoff[:, :, None, :, :] * z[..., None, None]
        zc = jnp.maximum(img[..., 2], 1e-6)
        gx = 2.0 * (img[..., 0] / zc) / Ws - 1.0
        gy = 2.0 * (img[..., 1] / zc) / Hs - 1.0
        x = ((gx + 1.0) * Ws - 1.0) * 0.5
        y = ((gy + 1.0) * Hs - 1.0) * 0.5
        x = jnp.clip(x, 0.0, Ws - 1.0)
        y = jnp.clip(y, 0.0, Hs - 1.0)
        bx = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, Ws - 1)
        by = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, Hs - 1)
        wx = x - bx.astype(x.dtype)
        wy = y - by.astype(y.dtype)
        return (by * Ws + bx), wx, wy

    # Reduce with means so XLA cannot slice-propagate the work away.
    def reduced(fn):
        def wrapped(*a):
            out = fn(*a)
            return sum(
                jnp.mean(o.astype(jnp.float32))
                for o in (out if isinstance(out, tuple) else (out,))
            )

        return wrapped

    # b) Planar layout: (S, H, W) coords, scalar affine coefficients.
    cc_pl = jnp.moveaxis(ccenter, -1, 0)  # (3, H, W, S) -> planarize
    cc_pl = jnp.moveaxis(cc_pl, -1, 1)  # (3, S, H, W)
    z_pl = jnp.moveaxis(z, -1, 0)  # (S, H, W)

    def planar(cc_pl, z_pl, kroff_const):
        xc, yc, zc0 = cc_pl[0], cc_pl[1], cc_pl[2]  # (S, H, W)
        # (bsq, S, H, W) via scalar broadcast per member
        x = xc[None] + kroff_const[:, 0][:, None, None, None] * z_pl[None]
        y = yc[None] + kroff_const[:, 1][:, None, None, None] * z_pl[None]
        zz = zc0[None] + kroff_const[:, 2][:, None, None, None] * z_pl[None]
        zcl = jnp.maximum(zz, 1e-6)
        px = jnp.clip(x / zcl - 0.5, 0.0, Ws - 1.0)
        py = jnp.clip(y / zcl - 0.5, 0.0, Hs - 1.0)
        bx = jnp.clip(jnp.floor(px).astype(jnp.int32), 0, Ws - 1)
        by = jnp.clip(jnp.floor(py).astype(jnp.int32), 0, Hs - 1)
        wx = px - bx.astype(px.dtype)
        wy = py - by.astype(py.dtype)
        return (by * Ws + bx), wx, wy

    # c) planar + the packed gather + tent combine, output (bsq,S,H,W,3).
    def planar_gather(cc_pl, z_pl, kroff_const, packed):
        idx, wx, wy = planar(cc_pl, z_pl, kroff_const)
        rows = jnp.take(packed, idx, axis=0)  # (bsq, S, H, W, 12)
        wx = wx[..., None].astype(packed.dtype)
        wy = wy[..., None].astype(packed.dtype)
        C = 3
        v00 = rows[..., 0 * C : 1 * C]
        v01 = rows[..., 1 * C : 2 * C]
        v10 = rows[..., 2 * C : 3 * C]
        v11 = rows[..., 3 * C : 4 * C]
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    def vec_gather(ccenter, z, KRoff, packed):
        idx, wx, wy = vec(ccenter, z, KRoff)
        rows = jnp.take(packed, idx, axis=0)  # (H, W, S, bsq, 12)
        wx = wx[..., None].astype(packed.dtype)
        wy = wy[..., None].astype(packed.dtype)
        C = 3
        v00 = rows[..., 0 * C : 1 * C]
        v01 = rows[..., 1 * C : 2 * C]
        v10 = rows[..., 2 * C : 3 * C]
        v11 = rows[..., 3 * C : 4 * C]
        top = v00 * (1 - wx) + v01 * wx
        bot = v10 * (1 - wx) + v11 * wx
        return top * (1 - wy) + bot * wy

    for name, fn, args in [
        ("coord math, vector (H,W,S,b2,3)", vec, (ccenter, z, KRoff)),
        ("coord math, planar (b2,S,H,W)", planar, (cc_pl, z_pl, kroff_const)),
        ("coord+gather, vector", vec_gather, (ccenter, z, KRoff, packed)),
        ("coord+gather, planar", planar_gather, (cc_pl, z_pl, kroff_const, packed)),
    ]:
        ms = chain_time(reduced(fn), *args)
        print(f"{name:38s} {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
