"""Measure the adaptive-sampling fill factor (VERDICT round-3 task 6).

Adaptive sampling (reference bundle_sampler.py:156-191) gives each bundle
spb = ceil(|CI| / min_interval) in [1, S] samples; our dense masked layout
(ops/bundles.py::sample_bundles) pays S for every bundle regardless.  The
mean fill factor mean(spb)/S bounds what bundle compaction could ever save
on the encode + NeRF head stages.

Runs the eval forward with Network.debug_outputs on and reports, per config,
the spb histogram and fill factor over synthetic scenes (no real data on
disk — CI widths on real DTU may differ; re-run when data exists).

Usage: python tools/measure_fill.py [--cfgs dtu_eval llff_eval nerf_eval]
       [--scenes 4] [--cpu]
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfgs", nargs="*",
                    default=["dtu_eval", "llff_eval", "nerf_eval"])
    ap.add_argument("--scenes", type=int, default=4)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        # env vars alone do not redirect on this machine (sitecustomize
        # force-selects the TPU plugin); jax.config wins.
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp

    from gdb_nerf_tpu.config import load_cfg
    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.runtime import make_network

    for name in args.cfgs:
        cfg = load_cfg(
            os.path.join(REPO, f"configs/{name}.yaml"), ["synthetic", "True"]
        )
        network = dataclasses.replace(
            make_network(cfg), debug_outputs=True, is_adaptive=True
        )
        S = network.max_num_samples
        loader = make_data_loader(cfg, is_train=False)

        @jax.jit
        def spb_of(variables, batch):
            ret, _, _ = network.apply(variables, batch, train=False)
            return ret["spb"]

        variables = None
        counts = np.zeros(S + 1, np.int64)
        for i, batch in enumerate(loader):
            if i >= args.scenes:
                break
            dev = {
                k: jax.tree.map(jnp.asarray, batch[k])
                for k in ("src_views", "tar_views", "near_far")
            }
            if variables is None:
                variables = network.init(jax.random.PRNGKey(0), dev,
                                         train=False)
            spb = np.asarray(spb_of(variables, dev)).astype(np.int64)
            counts += np.bincount(spb.ravel(), minlength=S + 1)

        total = counts.sum()
        mean_spb = float((np.arange(S + 1) * counts).sum() / max(total, 1))
        print(json.dumps({
            "config": name,
            "S": S,
            "mean_spb": round(mean_spb, 3),
            "fill_factor": round(mean_spb / S, 3),
            "spb_hist": {str(k): int(v) for k, v in enumerate(counts) if v},
            "note": "synthetic scenes (random-init weights -> CI from real "
                    "depth-regression variance on exact renders)",
        }))


if __name__ == "__main__":
    main()
