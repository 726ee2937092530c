"""Microbenchmarks of the gather patterns that dominate the encode path.

Measures XLA TPU gather throughput for the three access patterns the
pipeline uses (bilinear image fetch, trilinear volume fetch, mip fetch) at
eval-config sizes, plus variants (bf16, per-view loop vs batched, sorted
vs unsorted indices) to guide the Pallas kernel design.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp

    from gdb_nerf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
    from gdb_nerf_tpu.runtime.renderer import force_sync

    def timed(fn, *args, iters=10, name=""):
        out = fn(*args)
        force_sync(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
            force_sync(out)
        dt = (time.time() - t0) / iters * 1000
        print(f"{name:<44} {dt:8.2f} ms", flush=True)
        return dt

    key = jax.random.PRNGKey(0)
    H, W = 512, 640
    Hb, Wb, S, bsq, V = 256, 320, 3, 4, 3
    N = Hb * Wb * S * bsq  # ~983k points per view

    img = jax.random.uniform(key, (H, W, 3))
    grid = jax.random.uniform(key, (N, 2), minval=-1, maxval=1)

    f2 = jax.jit(lambda i, g: grid_sample_2d(i, g))
    timed(f2, img, grid, name=f"grid_sample_2d random idx {N} pts C=3")

    # Spatially coherent indices (what projection actually produces).
    ys, xs = jnp.meshgrid(
        jnp.linspace(-1, 1, Hb), jnp.linspace(-1, 1, Wb), indexing="ij"
    )
    coherent = jnp.stack([xs, ys], -1).reshape(-1, 1, 2)
    coherent = jnp.broadcast_to(coherent, (Hb * Wb, S * bsq, 2)).reshape(-1, 2)
    jitter = jax.random.uniform(key, coherent.shape, minval=-0.01, maxval=0.01)
    timed(f2, img, coherent + jitter, name="grid_sample_2d coherent idx")

    imgs = jax.random.uniform(key, (V, H, W, 3))
    grids = jax.random.uniform(key, (V, N, 2), minval=-1, maxval=1)
    fv = jax.jit(jax.vmap(grid_sample_2d, in_axes=(0, 0, None)), static_argnums=2)
    timed(fv, imgs, grids, "border", name="grid_sample_2d x3 views (vmap)")

    img16 = img.astype(jnp.bfloat16)
    timed(f2, img16, grid, name="grid_sample_2d bf16 source")

    # Wider channel count (the mip/feature fetch has C=19).
    imgC = jax.random.uniform(key, (Hb, Wb, 19))
    gridC = jax.random.uniform(key, (Hb * Wb * S, 2), minval=-1, maxval=1)
    timed(f2, imgC, gridC, name="grid_sample_2d C=19 245k pts")

    # 3D volume fetch.
    vol = jax.random.uniform(key, (8, Hb, Wb, 8))
    grid3 = jax.random.uniform(key, (Hb * Wb * S, 3), minval=-1, maxval=1)
    f3 = jax.jit(lambda v, g: grid_sample_3d(v, g))
    timed(f3, vol, grid3, name="grid_sample_3d 245k pts C=8")

    # Raw take() throughput reference.
    flat = jax.random.uniform(key, (H * W, 3))
    idx = jax.random.randint(key, (4 * N,), 0, H * W)
    ft = jax.jit(lambda f, i: jnp.take(f, i, axis=0))
    timed(ft, flat, idx, name=f"raw take {4*N} rows C=3")

    idx_sorted = jnp.sort(idx)
    timed(ft, flat, idx_sorted, name="raw take sorted rows C=3")

    # One-hot matmul alternative for a 245k x (HW) selection is infeasible;
    # but column-gather via dynamic_slice batches:
    x128 = jax.random.uniform(key, (H * W, 128))
    idx2 = jax.random.randint(key, (N,), 0, H * W)
    timed(ft, x128, idx2, name=f"raw take {N} rows C=128")


if __name__ == "__main__":
    main()
