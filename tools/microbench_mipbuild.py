"""A/B restructurings of the mip pyramid BUILD+PACK (not the fetch).

tools/ablate_frame.py's ``mippack`` knock (broadcast-dummy table, fetch
stays live) puts the build+pack chain at ~9 ms of the 50.5 ms fused DTU
frame — ~3x its traffic floor.  The suspect is TPU lane padding: every
(..., 19)-channel bf16 intermediate (feat+rgb concat, pyramid levels) is
physically padded to 128 lanes, so the chain moves ~250 MB for ~60 MB of
logical bytes.

Variants (all produce the identical (V, T, 4C) packed table; asserted):
  cur     ops/mip.py shipped: concat -> build_pyramid -> pack_pyramid
  dense   pyramid levels kept in merged (V, H, W*C) dense-lane form; each
          level's 4C pack reads the merged buffer through free reshapes
  packfirst  pack level 0 first, derive coarser levels by averaging the
          4 channel groups of the previous pack's even rows (no unpacked
          intermediate at all)
  floor   raw write of a same-physical-size (V, T, 128) bf16 buffer — the
          table-write lower bound

Usage: python tools/microbench_mipbuild.py [--hw 256 320] [--feat 16]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from microbench import chain_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=[256, 320])
    ap.add_argument("--feat", type=int, default=16)
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--levels", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gdb_nerf_tpu.ops import mip

    H, W = args.hw
    V, F, L = args.views, args.feat, args.levels
    C = F + 3
    key = jax.random.PRNGKey(0)
    feat = jax.random.uniform(key, (V, H, W, F)).astype(jnp.bfloat16)
    rgb = jax.random.uniform(jax.random.PRNGKey(1), (V, H, W, 3)).astype(
        jnp.bfloat16
    )
    T = sum((H >> l) * (W >> l) for l in range(L + 1))
    print(
        f"device: {jax.devices()[0]}  {H}x{W} V={V} C={C} levels={L + 1} "
        f"T={T} rows/view; table physical "
        f"{V * T * 128 * 2 / 1e6:.1f} MB (4C={4 * C} -> 128 lanes)",
        flush=True,
    )

    def cur(f, r):
        x = jnp.concatenate([f, r], axis=-1)
        packed, offs = mip.pack_pyramid(mip.build_pyramid(x, L))
        return packed

    def dense(f, r):
        return mip.build_pack_pyramid(f, r, L)[0]

    def packfirst(f, r):
        x = jnp.concatenate([f, r], axis=-1)
        from gdb_nerf_tpu.ops.grid_sample import pack_bilinear_2d

        packs = [pack_bilinear_2d(x)]
        for _ in range(L):
            p = packs[-1]
            # level l+1 texel (y, x) = mean of the 2x2 block held in packed
            # level l's row (2y, 2x) — the pack rows at even coordinates
            # contain exactly the block being averaged.
            blk = p[:, 0::2, 0::2, :]
            Vb, Hb, Wb, C4 = blk.shape
            nxt = blk.reshape(Vb, Hb, Wb, 4, C4 // 4).mean(axis=-2)
            packs.append(pack_bilinear_2d(nxt.astype(p.dtype)))
        flat = [p.reshape(V, -1, p.shape[-1]) for p in packs]
        return jnp.concatenate(flat, axis=-2)

    ref = np.asarray(jax.jit(cur)(feat, rgb), np.float32)

    variants = {"cur": cur, "packfirst": packfirst}
    if hasattr(mip, "build_pack_pyramid"):
        variants["dense"] = dense

    for name, fn in variants.items():
        got = np.asarray(jax.jit(fn)(feat, rgb), np.float32)
        err = np.abs(got - ref).max()
        # packfirst re-averages already-rounded bf16 blocks: one extra
        # rounding step vs building from the unpacked level.
        tol = 3e-2 if name != "cur" else 0.0
        assert err <= tol, (name, err)
        ms = chain_time(fn, feat, rgb)
        print(f"{name:10s} {ms:7.2f} ms  (max|diff| {err:.1e})", flush=True)

    zeros = jnp.zeros((V, T, 128), jnp.bfloat16)
    ms = chain_time(lambda z: z + jnp.bfloat16(1.0), zeros)
    print(f"{'floor':10s} {ms:7.2f} ms  (elementwise write of the same "
          f"physical table)", flush=True)


if __name__ == "__main__":
    main()
