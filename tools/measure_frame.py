"""Honest end-to-end frame latency via a chained device loop.

A fori_loop re-runs the full eval forward N times on-device with a data
dependency between iterations, then one host read syncs — this amortizes
both the tunnel RTT (~56 ms) and dispatch, measuring pure device time.

Usage: python tools/measure_frame.py [--dtype float32|bfloat16] [--n 8]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--marginal", action="store_true",
                    help="report the unbiased two-point marginal "
                    "(t(20)-t(4))/16 like bench.py — the single-chain "
                    "t(N)/N overstates the frame by ~30ms/N of launch "
                    "overhead (tools/reconcile_timing.py)")
    ap.add_argument("--cfg", default="configs/dtu_eval.yaml")
    ap.add_argument("--pallas", action="store_true")
    ap.add_argument("--set", nargs="*", default=[],
                    help="extra dotted config overrides, e.g. "
                    "--set synthetic_hw [800,800]")
    args = ap.parse_args()

    from gdb_nerf_tpu.runtime import cache

    cache.enable()
    import jax
    import jax.numpy as jnp

    from gdb_nerf_tpu.config import load_cfg
    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.runtime import make_network
    from gdb_nerf_tpu.runtime.renderer import force_sync, init_network, to_device

    cfg = load_cfg(
        args.cfg,
        ["synthetic", "True", "compute_dtype", args.dtype,
         "use_pallas", str(args.pallas)] + list(args.set),
    )
    network = make_network(cfg)
    loader = make_data_loader(cfg, is_train=False)
    batch = next(iter(loader))
    variables = init_network(network, cfg, sample_batch=batch)
    dev = to_device(batch)

    def run_n(n):
        def body(i, carry):
            sv = dict(dev["src_views"])
            sv["rgb"] = sv["rgb"] + carry * 1e-12
            b = {**dev, "src_views": sv}
            ret, _, _ = network.apply(variables, b, train=False)
            return ret["rgb"].mean()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    g = jax.jit(run_n, static_argnums=0)
    H, W = batch["src_views"]["rgb"].shape[2:4]
    if args.marginal:
        N1, N2 = 4, 20
        force_sync(g(N1))
        force_sync(g(N2))
        best1 = best2 = float("inf")
        for _ in range(3):
            t0 = time.time()
            force_sync(g(N1))
            best1 = min(best1, time.time() - t0)
            t0 = time.time()
            force_sync(g(N2))
            best2 = min(best2, time.time() - t0)
        best = (best2 - best1) / (N2 - N1)
        print(
            f"dtype={args.dtype} pallas={args.pallas}: {best*1000:.1f} "
            f"ms/frame marginal ({1.0/best:.2f} fps) at {H}x{W}, chains "
            f"t({N1})={best1*1e3:.1f} t({N2})={best2*1e3:.1f} ms, implied "
            f"overhead {(best1 - N1*best)*1e3:.1f} ms"
        )
        return
    force_sync(g(args.n))  # compile + warm
    best = float("inf")
    for _ in range(3):
        t0 = time.time()
        force_sync(g(args.n))
        best = min(best, (time.time() - t0) / args.n)
    print(
        f"dtype={args.dtype} pallas={args.pallas}: {best*1000:.1f} ms/frame "
        f"({1.0/best:.2f} fps) at {H}x{W}, chained n={args.n}"
    )


if __name__ == "__main__":
    main()
