"""Microbenchmarks that size the perf envelope of the current chip.

Measures, with chained on-device loops (one host read per measurement):
  * copy bandwidth (elementwise pass over N bytes),
  * gather row rate vs row width (the encode/cost-volume bottleneck shape),
  * conv throughput at small vs lane-width channel counts (FPN question:
    do C=8 convs pay a 128-lane padding tax?).

Usage: python tools/microbench.py [--quick]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def chain_time(fn, *args, iters=8, warmup=True):
    import jax
    import jax.numpy as jnp

    from gdb_nerf_tpu.runtime.renderer import force_sync

    def run_n(n):
        def body(i, carry):
            new_args = []
            done = False
            for a in args:
                if not done and hasattr(a, "dtype") and jnp.issubdtype(
                    a.dtype, jnp.floating
                ):
                    new_args.append(a + (carry * 1e-12).astype(a.dtype))
                    done = True
                else:
                    new_args.append(a)
            o = fn(*new_args)
            leaves = [
                l for l in jax.tree_util.tree_leaves(o)
                if hasattr(l, "dtype") and jnp.issubdtype(l.dtype, jnp.floating)
            ]
            return sum(
                jnp.sum(jnp.ravel(l)[:1]).astype(jnp.float32) for l in leaves
            )

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    g = jax.jit(run_n, static_argnums=0)
    force_sync(g(iters))
    best = float("inf")
    for _ in range(2):
        t0 = time.time()
        force_sync(g(iters))
        best = min(best, (time.time() - t0) / iters * 1000)
    return best


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)

    # --- copy bandwidth ---
    for mb in [64]:
        n = mb * 1024 * 1024 // 2
        x = jax.random.normal(key, (n,), jnp.bfloat16)
        ms = chain_time(lambda v: v * 1.0001, x)
        print(
            f"copy      {mb:4d} MB bf16: {ms:8.2f} ms  "
            f"{2 * mb / ms * 1000 / 1024:6.1f} GB/s (r+w)",
            flush=True,
        )

    # --- gather row rate vs width ---
    TABLE_ROWS = 81920  # a 256x320 feature map flattened
    N_IDX = 2_000_000
    idx = jax.random.randint(jax.random.PRNGKey(1), (N_IDX,), 0, TABLE_ROWS)
    widths = [8, 16, 48, 128] if args.quick else [4, 8, 16, 32, 48, 64, 128]
    for C in widths:
        tab = jax.random.normal(key, (TABLE_ROWS, C), jnp.bfloat16)
        ms = chain_time(lambda t: jnp.take(t, idx, axis=0), tab)
        rate = N_IDX / (ms / 1000) / 1e6
        gbs = N_IDX * C * 2 / (ms / 1000) / 2**30
        print(
            f"gather C={C:4d}: {ms:8.2f} ms   {rate:7.1f} M rows/s   "
            f"{gbs:6.1f} GB/s",
            flush=True,
        )

    # --- 2D gather (image-shaped indices, like grid_sample) ---
    H, W, C = 512, 640, 12
    img = jax.random.normal(key, (H * W, C), jnp.bfloat16)
    idx2 = jax.random.randint(jax.random.PRNGKey(2), (2_949_120,), 0, H * W)
    ms = chain_time(lambda t: jnp.take(t, idx2, axis=0), img)
    print(
        f"gather member-rgb shape (2.95M rows, C=12): {ms:8.2f} ms "
        f"({2_949_120 / (ms / 1000) / 1e6:.1f} M rows/s)",
        flush=True,
    )

    # --- conv channel tax: same bytes, different channel counts ---
    from functools import partial

    def conv(x, k):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    cases = [
        ("C8   512x640", (1, 512, 640, 8), (3, 3, 8, 8)),
        ("C32  256x320", (1, 256, 320, 32), (3, 3, 32, 32)),
        ("C128 128x160", (1, 128, 160, 128), (3, 3, 128, 128)),
    ]
    for name, xs, ks in cases:
        x = jax.random.normal(key, xs, jnp.bfloat16)
        k = jax.random.normal(key, ks, jnp.bfloat16)
        ms = chain_time(lambda v: conv(v, k), x)
        flops = 2 * np.prod(xs) * ks[0] * ks[1] * ks[3]
        mb = np.prod(xs) * 2 * 2 / 2**20
        print(
            f"conv {name}: {ms:8.2f} ms  {flops / (ms / 1000) / 1e12:6.2f} TF/s  "
            f"act {mb:.0f} MB",
            flush=True,
        )

    # --- conv3d like CostRegNet stage1 first layer ---
    x = jax.random.normal(key, (1, 8, 256, 320, 8), jnp.bfloat16)
    k = jax.random.normal(key, (3, 3, 3, 8, 8), jnp.bfloat16)

    def conv3(v):
        return jax.lax.conv_general_dilated(
            v, k, (1, 1, 1), [(1, 1), (1, 1), (1, 1)],
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )

    ms = chain_time(conv3, x)
    print(f"conv3d C8 (8,256,320): {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
