"""Benchmark: DTU-protocol 512x640 novel-view synthesis fps on one chip.

Prints ONE JSON line: {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

Protocol matches the reference's FPS measurement (run.py:68-73): repeated
forwards of the eval-config network (3 source views, 512x640, adaptive
sampling with max 3 samples/bundle), first iteration (compile) excluded.
Runs on whatever accelerator JAX finds (the one real TPU chip under the
driver).  Data is the synthetic DTU-like dataset — the benchmark measures
the network, not disk IO.  Baseline: the driver target of 30 fps on v5e.
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def main() -> None:
    from gdb_nerf_tpu.runtime import cache

    cache.enable()
    from gdb_nerf_tpu.config import load_cfg
    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.runtime import Renderer, make_network
    from gdb_nerf_tpu.runtime.renderer import init_network

    # Production inference dtype: bf16 feature path (geometry stays fp32).
    cfg = load_cfg(
        "configs/dtu_eval.yaml", ["synthetic", "True", "compute_dtype", "bfloat16"]
    )
    network = make_network(cfg)

    loader = make_data_loader(cfg, is_train=False)
    batches = []
    for i, batch in enumerate(loader):
        batches.append(batch)
        if i >= 3:
            break

    variables = init_network(network, cfg, sample_batch=batches[0])
    renderer = Renderer(network, variables)

    times = []
    n_iters = 12
    for i in range(n_iters):
        batch = batches[i % len(batches)]
        t0 = time.time()
        renderer.render_blocking(batch)
        times.append(time.time() - t0)

    fps = 1.0 / float(np.mean(times[1:]))
    baseline_fps = 30.0  # driver target for one v5e chip
    print(
        json.dumps(
            {
                "metric": "dtu_512x640_novel_view_fps",
                "value": round(fps, 3),
                "unit": "fps",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
