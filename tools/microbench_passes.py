"""Split per-conv-pass fixed overhead from work: the pass-count hypothesis.

Round-5 synthesis of every frame A/B so far: gather-row reductions measure
null (vox_tent, mip_pair), byte reductions measure null (enc_flat, cv_flat,
cv_barrier), while every WIN either removed fused passes (mode="clip",
-2.1 ms) or replaced many narrow convs with fewer dense ones (dfold,
-4.7 ms) — and the one catastrophic regression multiplied pass count 9x
(shift+dot ConvBlocks: +54 ms).  Hypothesis: the fused frame is bound by
the COUNT of serialized kernel passes times a fixed per-pass cost, plus
work for the dense ones.

This probe times in-graph conv chains (BN-free: conv -> bias -> relu, the
relu fusing into the conv pass) at N in {4, 12} convs and a size grid, on
the ambient device.  Per-conv marginal = (t(12) - t(4)) / 8; if it stays
~flat while per-conv FLOPs move 16x, the fixed-cost model holds and its
intercept IS the per-pass overhead.

Usage: python tools/microbench_passes.py [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--rounds", type=int, default=3)
    args = ap.parse_args()

    from gdb_nerf_tpu.runtime import cache

    cache.enable()
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gdb_nerf_tpu.runtime.renderer import force_sync

    dtype = jnp.dtype(args.dtype)
    # (C, H, W) grid: work per conv spans 256x (C8@64x80 ... C32@512x640).
    grid = [
        (8, 64, 80), (8, 128, 160), (8, 256, 320), (8, 512, 640),
        (16, 128, 160), (16, 256, 320),
        (32, 128, 160), (32, 256, 320), (32, 512, 640),
        (64, 256, 320),
    ]
    Ns = (4, 12)

    def chain(C, H, W, n):
        k = jax.random.PRNGKey(0)
        w = jax.random.normal(k, (3, 3, C, C), dtype) * 0.1
        b = jnp.zeros((C,), dtype)
        x0 = jax.random.normal(k, (1, H, W, C), dtype)

        def f(x0):
            x = x0
            for _ in range(n):
                x = lax.conv_general_dilated(
                    x, w, (1, 1), "SAME",
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                x = jax.nn.relu(x + b)
            return x.mean()

        g = jax.jit(f)
        force_sync(g(x0))  # compile+warm
        best = float("inf")
        for _ in range(args.rounds):
            t0 = time.time()
            force_sync(g(x0))
            best = min(best, time.time() - t0)
        return best

    rows = []
    for C, H, W in grid:
        t4 = chain(C, H, W, Ns[0])
        t12 = chain(C, H, W, Ns[1])
        per = (t12 - t4) / (Ns[1] - Ns[0])
        gflop = 2 * 9 * C * C * H * W / 1e9
        row = {
            "C": C, "H": H, "W": W,
            "per_conv_ms": round(per * 1e3, 3),
            "gflop_per_conv": round(gflop, 3),
            "tf_per_s": round(gflop / max(per, 1e-9) / 1e3, 3),
            "t4_ms": round(t4 * 1e3, 2), "t12_ms": round(t12 * 1e3, 2),
        }
        rows.append(row)
        print(json.dumps(row), flush=True)

    # Fixed-cost fit: per_conv = a + b * gflop (least squares).
    import numpy as np

    A = np.array([[1.0, r["gflop_per_conv"]] for r in rows])
    y = np.array([r["per_conv_ms"] for r in rows])
    coef, *_ = np.linalg.lstsq(A, y, rcond=None)
    print(json.dumps({
        "fit_overhead_ms_per_pass": round(float(coef[0]), 3),
        "fit_ms_per_gflop": round(float(coef[1]), 3),
        "implied_tf_per_s_marginal": round(2.0 / max(float(coef[1]), 1e-9), 1),
    }))


if __name__ == "__main__":
    main()
