"""Gather row-rate vs table size / index count / index layout.

Motivated by the LLFF 640x960 frame ablation: member-RGB marginal is
47.9 ms there vs 9.6 ms at DTU 512x640 — 5x the cost for 1.875x the rows.
Either the gather row rate itself collapses with larger tables/index
counts, or the fusion regime changes (coordinate math materializing).
This probe isolates the first factor.

Usage: python tools/microbench_gather_scaling.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from tools.microbench import chain_time


def main():
    key = jax.random.PRNGKey(0)
    C = 12
    print(f"device: {jax.devices()[0]}", flush=True)

    # --- rate vs table size (fixed 2M random indices) ---
    N = 2_000_000
    for rows in [81_920, 163_840, 327_680, 614_400, 1_228_800]:
        tab = jax.random.normal(key, (rows, C), jnp.bfloat16)
        idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, rows)
        ms = chain_time(lambda t: jnp.take(t, idx, axis=0), tab)
        print(
            f"table {rows:9d} rows x C{C}: {ms:7.2f} ms  "
            f"{N / (ms / 1000) / 1e6:7.1f} M rows/s",
            flush=True,
        )

    # --- rate vs index count (fixed 614k-row table = LLFF source) ---
    rows = 614_400
    tab = jax.random.normal(key, (rows, C), jnp.bfloat16)
    for N in [1_000_000, 2_949_120, 5_529_600]:
        idx = jax.random.randint(jax.random.PRNGKey(2), (N,), 0, rows)
        ms = chain_time(lambda t: jnp.take(t, idx, axis=0), tab)
        print(
            f"idx {N:9d} @ 614k table:  {ms:7.2f} ms  "
            f"{N / (ms / 1000) / 1e6:7.1f} M rows/s",
            flush=True,
        )

    # --- raster-coherent vs random indices (both real-fetch layouts) ---
    for name, maker in [
        ("coherent", lambda N: jnp.clip(
            (jnp.arange(N) * (rows / N)).astype(jnp.int32), 0, rows - 1)),
        ("random", lambda N: jax.random.randint(
            jax.random.PRNGKey(3), (N,), 0, rows)),
    ]:
        N = 5_529_600
        idx = maker(N)
        ms = chain_time(lambda t: jnp.take(t, idx, axis=0), tab)
        print(
            f"{name:9s} idx 5.53M @ 614k: {ms:7.2f} ms  "
            f"{N / (ms / 1000) / 1e6:7.1f} M rows/s",
            flush=True,
        )

    # --- multi-dim index tensor (the encode layout) vs flat ---
    Hb, Wb, S, bsq = 320, 480, 3, 4
    idx4 = jax.random.randint(
        jax.random.PRNGKey(4), (Hb, Wb, S, bsq), 0, rows)
    ms = chain_time(lambda t: jnp.take(t, idx4, axis=0), tab)
    N = Hb * Wb * S * bsq
    print(
        f"(320,480,3,4) idx @ 614k: {ms:7.2f} ms  "
        f"{N / (ms / 1000) / 1e6:7.1f} M rows/s",
        flush=True,
    )
    # DTU-shaped for comparison
    idx4d = jax.random.randint(
        jax.random.PRNGKey(5), (256, 320, 3, 4), 0, 327_680)
    tabd = jax.random.normal(key, (327_680, C), jnp.bfloat16)
    ms = chain_time(lambda t: jnp.take(t, idx4d, axis=0), tabd)
    N = 256 * 320 * 3 * 4
    print(
        f"(256,320,3,4) idx @ 327k: {ms:7.2f} ms  "
        f"{N / (ms / 1000) / 1e6:7.1f} M rows/s",
        flush=True,
    )


if __name__ == "__main__":
    main()
