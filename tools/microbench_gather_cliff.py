"""Locate and characterize the gather row-rate cliff.

tools/microbench_gather_scaling.py found tables <= 327k rows gather at
~300 M rows/s while >= 614k rows run at ~122 M rows/s (coherence-
independent).  This probe answers the questions that decide the fix:

  1. WHERE is the cliff (rows sweep at C12)?
  2. Is it ROWS-based or BYTES-based?  Same-bytes ladder: (614k, C12),
     (307k, C24), (153k, C48), (76k, C96) — all 14.7 MB.  If rows-based,
     each halving of rows recovers rate; if bytes-based, all stay slow.
  3. Does widening rows at fixed row count cost anything (327k x C12/24/48)?
  4. End-to-end: the parity-packed member-RGB fetch — table (H*W/2, 8C)
     with post-gather half-select — vs the flat (H*W, 4C) fetch at LLFF
     source size, including the select arithmetic.

Usage: python tools/microbench_gather_cliff.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.microbench import chain_time


def main():
    sections = set(sys.argv[1:]) or {"1", "2", "3", "4"}
    key = jax.random.PRNGKey(0)
    print(f"device: {jax.devices()[0]}", flush=True)
    N = 2_000_000

    if "1" not in sections:
        pass
    else:
        run_section1(key, N)
    if "2" in sections:
        run_section2(key, N)
    if "3" in sections:
        run_section3(key, N)
    if "4" in sections:
        run_section4(key)


def run_section1(key, N):
    print("--- 1. cliff location (C12, 2M idx) ---", flush=True)
    for rows in [327_680, 393_216, 458_752, 491_520, 524_288, 589_824, 614_400]:
        tab = jax.random.normal(key, (rows, 12), jnp.bfloat16)
        idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, rows)
        ms = chain_time(lambda t: jnp.take(t, idx, axis=0), tab)
        mb = rows * 12 * 2 / 2**20
        print(f"rows {rows:8d} ({mb:5.1f} MB): {ms:7.2f} ms "
              f"{N / (ms / 1000) / 1e6:7.1f} M rows/s", flush=True)


def run_section2(key, N):
    print("--- 2. same-bytes ladder (14.7 MB each, 2M idx) ---", flush=True)
    for rows, C in [(614_400, 12), (307_200, 24), (153_600, 48), (76_800, 96)]:
        tab = jax.random.normal(key, (rows, C), jnp.bfloat16)
        idx = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, rows)
        ms = chain_time(lambda t: jnp.take(t, idx, axis=0), tab)
        print(f"rows {rows:8d} x C{C:3d}: {ms:7.2f} ms "
              f"{N / (ms / 1000) / 1e6:7.1f} M rows/s", flush=True)


def run_section3(key, N):
    print("--- 3. width sweep at 327k rows (2M idx) ---", flush=True)
    for C in [12, 24, 48]:
        tab = jax.random.normal(key, (327_680, C), jnp.bfloat16)
        idx = jax.random.randint(jax.random.PRNGKey(3), (N,), 0, 327_680)
        ms = chain_time(lambda t: jnp.take(t, idx, axis=0), tab)
        mb = 327_680 * C * 2 / 2**20
        print(f"C{C:3d} ({mb:5.1f} MB): {ms:7.2f} ms "
              f"{N / (ms / 1000) / 1e6:7.1f} M rows/s", flush=True)


def run_section4(key):
    print("--- 4. parity-packed fetch vs flat (LLFF member-RGB shape) ---",
          flush=True)
    # LLFF source: 640x960 image, 4C=12 packed channels, 2.95M fetches
    H, W, C4 = 640, 960, 12
    Nf = 2_949_120
    flat = jax.random.normal(key, (H * W, C4), jnp.bfloat16)
    xf = jax.random.uniform(jax.random.PRNGKey(4), (Nf,), minval=0.0,
                            maxval=W - 1.001)
    yf = jax.random.uniform(jax.random.PRNGKey(5), (Nf,), minval=0.0,
                            maxval=H - 1.001)

    def fetch_flat(tab):
        bx = jnp.floor(xf).astype(jnp.int32)
        by = jnp.floor(yf).astype(jnp.int32)
        rows = jnp.take(tab, by * W + bx, axis=0)
        wx = (xf - bx)[:, None].astype(tab.dtype)
        wy = (yf - by)[:, None].astype(tab.dtype)
        C = C4 // 4
        top = rows[:, 0:C] * (1 - wx) + rows[:, C:2 * C] * wx
        bot = rows[:, 2 * C:3 * C] * (1 - wx) + rows[:, 3 * C:] * wx
        return top * (1 - wy) + bot * wy

    ms = chain_time(fetch_flat, flat)
    print(f"flat   ({H * W} rows x C{C4}): {ms:7.2f} ms "
          f"{Nf / (ms / 1000) / 1e6:7.1f} M rows/s", flush=True)

    # Parity-packed: (H*W/2, 2*C4); row k holds x=2k and x=2k+1 packs.
    paired = flat.reshape(H, W // 2, 2 * C4).reshape(H * W // 2, 2 * C4)

    def fetch_paired(tab):
        bx = jnp.floor(xf).astype(jnp.int32)
        by = jnp.floor(yf).astype(jnp.int32)
        rows = jnp.take(tab, by * (W // 2) + (bx >> 1), axis=0)
        odd = (bx & 1).astype(tab.dtype)[:, None]
        half = rows[:, :C4] * (1 - odd) + rows[:, C4:] * odd
        wx = (xf - bx)[:, None].astype(tab.dtype)
        wy = (yf - by)[:, None].astype(tab.dtype)
        C = C4 // 4
        top = half[:, 0:C] * (1 - wx) + half[:, C:2 * C] * wx
        bot = half[:, 2 * C:3 * C] * (1 - wx) + half[:, 3 * C:] * wx
        return top * (1 - wy) + bot * wy

    ms = chain_time(fetch_paired, paired)
    print(f"paired ({H * W // 2} rows x C{2 * C4}): {ms:7.2f} ms "
          f"{Nf / (ms / 1000) / 1e6:7.1f} M rows/s", flush=True)

    # quad-packed: (H*W/4, 4*C4)
    quad = flat.reshape(H, W // 4, 4 * C4).reshape(H * W // 4, 4 * C4)

    def fetch_quad(tab):
        bx = jnp.floor(xf).astype(jnp.int32)
        by = jnp.floor(yf).astype(jnp.int32)
        rows = jnp.take(tab, by * (W // 4) + (bx >> 2), axis=0)
        q = bx & 3
        half = (
            rows[:, 0 * C4:1 * C4] * (q == 0).astype(tab.dtype)[:, None]
            + rows[:, 1 * C4:2 * C4] * (q == 1).astype(tab.dtype)[:, None]
            + rows[:, 2 * C4:3 * C4] * (q == 2).astype(tab.dtype)[:, None]
            + rows[:, 3 * C4:4 * C4] * (q == 3).astype(tab.dtype)[:, None]
        )
        wx = (xf - bx)[:, None].astype(tab.dtype)
        wy = (yf - by)[:, None].astype(tab.dtype)
        C = C4 // 4
        top = half[:, 0:C] * (1 - wx) + half[:, C:2 * C] * wx
        bot = half[:, 2 * C:3 * C] * (1 - wx) + half[:, 3 * C:] * wx
        return top * (1 - wy) + bot * wy

    ms = chain_time(fetch_quad, quad)
    print(f"quad   ({H * W // 4} rows x C{4 * C4}): {ms:7.2f} ms "
          f"{Nf / (ms / 1000) / 1e6:7.1f} M rows/s", flush=True)


if __name__ == "__main__":
    main()
