"""Timing-protocol defense: prove the chained fori_loop measures real frames.

bench.py times N chained forwards with one host read because
``block_until_ready`` returns at dispatch on this tunneled platform
(commit 248fb8d).  Two residual concerns an auditor could raise:

  1. *Amortization*: does the chained loop hide per-iteration work, i.e.
     is time(N)/N << time(1)?  We time N=1 and N=10 and compare the
     marginal frame ((t10-t1)/9) against the mean (t10/10).
  2. *CSE/input-reuse*: iterations perturb the same input by carry*1e-12 —
     could XLA collapse iterations or reuse work across them?  We A/B
     against a variant where each iteration renders a genuinely DIFFERENT
     pre-staged source-image set (lax.switch on i%2), which no compiler
     can fold.

Usage: python tools/verify_timing.py   (run on the TPU)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from gdb_nerf_tpu.runtime import cache

    cache.enable()
    import jax
    import jax.numpy as jnp

    from gdb_nerf_tpu.config import load_cfg
    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.runtime import make_network
    from gdb_nerf_tpu.runtime.renderer import force_sync, init_network, to_device

    cfg = load_cfg(
        "configs/dtu_eval.yaml", ["synthetic", "True", "compute_dtype", "bfloat16"]
    )
    network = make_network(cfg)
    loader = make_data_loader(cfg, is_train=False)
    it = iter(loader)
    batch = next(it)
    batch2 = next(it)  # a different synthetic scene
    variables = init_network(network, cfg, sample_batch=batch)
    dev = to_device(batch)
    rgb2 = to_device(batch2)["src_views"]["rgb"]

    def timed(fn, n, reps=3):
        g = jax.jit(fn, static_argnums=0)
        force_sync(g(n))  # compile + warmup
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            force_sync(g(n))
            best = min(best, time.time() - t0)
        return best

    # --- bench.py's chained loop (perturbed same-input) ---
    def run_same(n):
        def body(i, carry):
            sv = dict(dev["src_views"])
            sv["rgb"] = sv["rgb"] + carry * 1e-12
            b = {**dev, "src_views": sv}
            ret, _, _ = network.apply(variables, b, train=False)
            return ret["rgb"].mean()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    # --- distinct-inputs variant: alternate two real image sets ---
    stacked = jnp.stack([dev["src_views"]["rgb"], rgb2])  # (2, V, H, W, 3)

    def run_distinct(n):
        def body(i, carry):
            sv = dict(dev["src_views"])
            sv["rgb"] = stacked[i % 2] + carry * 1e-12
            b = {**dev, "src_views": sv}
            ret, _, _ = network.apply(variables, b, train=False)
            return ret["rgb"].mean()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    t1 = timed(run_same, 1)
    t10 = timed(run_same, 10)
    marginal = (t10 - t1) / 9.0
    mean10 = t10 / 10.0
    print(f"same-input   : t(1)={t1 * 1e3:7.2f} ms  t(10)={t10 * 1e3:8.2f} ms")
    print(
        f"  mean frame {mean10 * 1e3:6.2f} ms vs marginal frame "
        f"{marginal * 1e3:6.2f} ms (ratio {mean10 / marginal:.3f} — "
        f"~1.0 means no amortization hiding)"
    )

    d1 = timed(run_distinct, 1)
    d10 = timed(run_distinct, 10)
    print(f"distinct-in  : t(1)={d1 * 1e3:7.2f} ms  t(10)={d10 * 1e3:8.2f} ms")
    print(
        f"  distinct/same mean-frame ratio {d10 / t10:.3f} "
        f"(~1.0 means no CSE/input-reuse advantage in the chained timer)"
    )


if __name__ == "__main__":
    main()
