"""Benchmark: DTU-protocol 512x640 novel-view synthesis fps on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Protocol matches the reference's FPS measurement (run.py:54-73): the batch
is transferred to the device BEFORE the timed region (`to_cuda` happens
outside the timer there too), and the timer brackets only the network
forward.  On this tunneled TPU, per-dispatch sync costs a ~56 ms RTT that a
local `cuda.synchronize()` does not, so the forward is timed with a chained
on-device loop (iterations data-depend on each other; one host read at the
end) — this measures pure device time per frame, the same quantity the
reference protocol measures on a local GPU.

Round-5 refinement (tools/reconcile_timing.py, VERDICT r4 task 3): a single
chain of length N still carries ONE fixed ~30-32 ms launch+RTT overhead, so
t(N)/N overstates the frame by overhead/N — this was the entire systematic
gap between the old N=10 bench (44.5 ms/frame) and N=8 measure_frame
(45.4): same marginal, different amortization.  The unbiased estimator of
device-time-per-frame is the two-point marginal (t(N2) - t(N1)) / (N2 - N1)
— the launch overhead cancels exactly, matching what the reference's timer
measures on a local GPU where sync costs ~µs.  Both chain timings and the
implied overhead are reported alongside the headline.

Config: dtu_eval (3 source views, adaptive sampling, max 3 samples/bundle),
bf16 feature path (production inference dtype), synthetic DTU-like scene
(the benchmark measures the network, not disk IO).  Baseline: the driver
target of 30 fps on one v5e chip.
"""

from __future__ import annotations

import json
import time

import numpy as np


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
    batch = next(iter(loader))
    variables = init_network(network, cfg, sample_batch=batch)
    dev = to_device(batch)

    N1, N2 = 4, 20

    def run_n(n):
        def body(i, carry):
            sv = dict(dev["src_views"])
            sv["rgb"] = sv["rgb"] + carry * 1e-12
            b = {**dev, "src_views": sv}
            ret, _, _ = network.apply(variables, b, train=False)
            return ret["rgb"].mean()

        return jax.lax.fori_loop(0, n, body, jnp.float32(0.0))

    g = jax.jit(run_n, static_argnums=0)
    # compile + warmup (excluded, like the reference's iter 0)
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

    best = (best2 - best1) / (N2 - N1)  # launch overhead cancels
    overhead_ms = (best1 - N1 * best) * 1e3
    fps = 1.0 / best
    baseline_fps = 30.0  # driver target for one v5e chip
    H, W = batch["tar_views"]["rgb"].shape[1:3] if "rgb" in batch[
        "tar_views"
    ] else (512, 640)
    print(
        json.dumps(
            {
                "metric": "dtu_512x640_novel_view_fps",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / baseline_fps, 3),
                # BASELINE.json tracked metric: one ray per rendered pixel.
                "rays_per_sec_per_chip": round(H * W * fps),
                # Diagnostics: raw chain timings + the launch overhead the
                # marginal removed (reconcile_timing.py session data).
                "chain_ms": {str(N1): round(best1 * 1e3, 1),
                             str(N2): round(best2 * 1e3, 1)},
                "launch_overhead_ms": round(overhead_ms, 1),
            }
        )
    )


if __name__ == "__main__":
    main()
