"""Sub-stage latency breakdown of encode_samples on the current device.

Times, with chained loops: the full encode (exact vs member_patch), and its
isolated pieces — member-RGB fetch, mip fetch, voxel fetch, projection math
— so the optimization target inside the dominant stage is identified by
measurement, not guesswork.

Usage: python tools/profile_encode.py [--size H W]
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
    ap.add_argument("--size", type=int, nargs=2, default=[512, 640])
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--samples", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from gdb_nerf_tpu.ops import bundles, camera, mip
    from gdb_nerf_tpu.ops.grid_sample import (
        gather_patch_bilinear,
        grid_sample_2d_packed,
        grid_sample_3d_packed,
        pack_bilinear_2d,
        pack_patch_2d,
        pack_trilinear_3d,
    )

    H, W = args.size
    V, S, b = args.views, args.samples, 2
    Hb, Wb = H // b, W // b
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}  {H}x{W} V={V} S={S}", flush=True)

    K = np.array([[2.0 * W, 0, W / 2], [0, 2.0 * W, H / 2], [0, 0, 1]], np.float32)
    exts = []
    for i in range(V + 1):
        e = np.eye(4, dtype=np.float32)
        e[0, 3] = -0.3 + 0.2 * i
        e[2, 3] = 4.0
        exts.append(e)
    src_exts = jnp.asarray(np.stack(exts[:V]))
    tar_ext = jnp.asarray(exts[-1])
    Kj = jnp.asarray(K)

    rb = bundles.make_ray_bundles(
        tar_ext, Kj, (H, W), jnp.asarray(2.5), jnp.asarray(6.0), b
    )
    dr = jnp.stack([jnp.full((Hb, Wb), 3.5), jnp.full((Hb, Wb), 4.5)])
    vr = jnp.stack([jnp.full((Hb, Wb), 2.5), jnp.full((Hb, Wb), 6.0)])
    smp = jax.jit(
        lambda d, v: bundles.sample_bundles(rb, d, v, S, 64, False, True)
    )(dr, vr)

    src_imgs = jax.random.uniform(key, (V, H, W, 3)).astype(dt)
    img_feat = jax.random.uniform(key, (V, Hb, Wb, 19)).astype(dt)
    fvol = jax.random.uniform(key, (8, Hb, Wb, 8)).astype(dt)
    src_ints = jnp.stack([Kj] * V)

    # --- full encode, exact vs patch ---
    for patch in (False, True):
        f = jax.jit(
            lambda si: bundles.encode_samples(
                rb, smp, si, img_feat,
                *mip.pack_pyramid(mip.build_pyramid(img_feat, 3)),
                fvol, src_exts, src_ints, 3, patch,
            )
        )
        ms = chain_time(f, src_imgs, iters=5)
        print(f"encode full (member_patch={patch}): {ms:8.2f} ms", flush=True)

    # --- isolated pieces ---
    # world positions of member samples (shared by the fetch paths)
    member_dirs = (
        rb.bundle_d[:, :, None, :] + rb.member_off[None, None, :, :]
    )  # (H, W, bsq, 3)
    rays_xyz = (
        rb.rays_o + member_dirs[:, :, None, :, :] * smp.z_metric[..., None, None]
    )

    def proj_math(imgs):
        outs = []
        for v in range(V):
            cam = camera.mm(rays_xyz, src_exts[v, :3, :3].T) + src_exts[v, :3, 3]
            img = camera.mm(cam, Kj.T)
            zc = jnp.maximum(img[..., 2], 1e-6)
            outs.append(img[..., 0] / zc + img[..., 1] / zc)
        return sum(outs) + imgs[0, 0, 0, 0]

    print(f"  proj math only: {chain_time(proj_math, src_imgs, iters=5):8.2f} ms",
          flush=True)

    # member fetch: exact (2x2 packed, 1 row/ray) vs patch (4x4, 1 row/bundle)
    cam = camera.mm(rays_xyz, src_exts[0, :3, :3].T) + src_exts[0, :3, 3]
    img = camera.mm(cam, Kj.T)
    zc = jnp.maximum(img[..., 2], 1e-6)
    gx = 2.0 * (img[..., 0] / zc) / W - 1.0
    gy = 2.0 * (img[..., 1] / zc) / H - 1.0
    grid = jnp.stack([gx, gy], axis=-1)  # (Hb, Wb, S, 4, 2)
    cxy = jnp.stack([img[..., 0] / zc - 0.5, img[..., 1] / zc - 0.5], axis=-1)

    packed22 = jax.jit(pack_bilinear_2d)(src_imgs)
    f = jax.jit(lambda p: sum(
        grid_sample_2d_packed(p[v], grid, "border").mean() for v in range(V)
    ))
    print(f"  member rgb 2x2 rows (x{V}): {chain_time(f, packed22, iters=5):8.2f} ms",
          flush=True)

    packed44 = jax.jit(lambda s: pack_patch_2d(s, 4))(src_imgs)
    f = jax.jit(lambda p: sum(
        gather_patch_bilinear(p[v], cxy, 4).mean() for v in range(V)
    ))
    print(f"  member rgb 4x4 shared (x{V}): {chain_time(f, packed44, iters=5):8.2f} ms",
          flush=True)
    f = jax.jit(lambda s: pack_patch_2d(s, 4).mean(axis=(1, 2)))
    print(f"  pack_patch_2d build: {chain_time(f, src_imgs, iters=5):8.2f} ms",
          flush=True)

    # mip fetch (floor+ceil taps per sample per view)
    packed_pyr, offs = jax.jit(
        lambda f2: mip.pack_pyramid(mip.build_pyramid(f2, 3))
    )(img_feat)
    uv = jax.random.uniform(key, (V, Hb, Wb, S, 2))
    lod = jax.random.uniform(key, (V, Hb, Wb, S)) * 3
    f = jax.jit(lambda p: sum(
        mip.mip_texture_fetch_packed(p[v], offs, (Hb, Wb), uv[v], lod[v], 3).mean()
        for v in range(V)
    ))
    print(f"  mip fetch (x{V}): {chain_time(f, packed_pyr, iters=5):8.2f} ms",
          flush=True)

    # voxel fetch
    vox_packed = jax.jit(pack_trilinear_3d)(fvol)
    f = jax.jit(
        lambda p: grid_sample_3d_packed(p, smp.uvd, "border").mean()
    )
    print(f"  vox fetch: {chain_time(f, vox_packed, iters=5):8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
