"""Measure the mip-fetch fractional-LOD histogram (VERDICT round-4 task 1b).

The mip fetch (ops/mip.py::mip_texture_fetch_packed) is the fattest single
frame item (14.8 ms DCE marginal vs a ~5.9 ms gather-row floor) and always
pays TWO gather taps per (sample, view): floor(lod) and ceil(lod) levels.
Whether a cheaper static structure is admissible depends on where the lod
population actually sits:

  * lod <= 0 everywhere        -> the ceil tap has weight exactly 0
                                  (clip -> 0, frac = 0): a single level-0
                                  tap is EXACT.
  * lod in [0, 1] everywhere   -> floor is statically level 0, ceil level 1:
                                  the dynamic exp2/offset arithmetic is dead.
  * lod >= max_level anywhere  -> both taps hit the same level (s1 == s0).

This tool wraps the fetch with a jax.debug.callback that stashes the
pre-clip lod tensor during the real jitted eval forward (synthetic scenes,
full protocol size) and prints the histogram + the saturation fractions per
config.  Reference semantics being matched: nvdiffrast mip_level_bias
trilinear filtering (/root/reference/networks/gdb_nerf/bundle_sampler.py:355-359).

Usage: python tools/measure_lod.py [--cfgs dtu_eval llff_eval nerf_eval]
       [--scenes 2] [--cpu]
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--cfgs", nargs="*", default=["dtu_eval", "llff_eval", "nerf_eval"]
    )
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    from gdb_nerf_tpu.runtime import cache

    cache.enable()
    import jax

    # The axon TPU platform does not support host callbacks (measured
    # 2026-08-20: "UNIMPLEMENTED: axon_pjrt does not support host
    # send/recv callbacks"), and the LOD is a pure geometry quantity —
    # identical on CPU — so this tool always runs on the CPU backend.
    jax.config.update("jax_platforms", "cpu")

    from gdb_nerf_tpu.config import load_cfg
    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.ops import bundles
    from gdb_nerf_tpu.ops.mip import mip_texture_fetch_packed
    from gdb_nerf_tpu.runtime import make_network
    from gdb_nerf_tpu.runtime.renderer import force_sync, init_network, to_device

    stash: list = []

    def tapped(packed, offsets, base_hw, uv, lod, max_level):
        jax.debug.callback(lambda l: stash.append(np.asarray(l)), lod)
        return mip_texture_fetch_packed(
            packed, offsets, base_hw, uv, lod, max_level
        )

    bundles.mip_texture_fetch_packed = tapped

    # The synthetic loader defaults to 512x640 regardless of config — the
    # protocol size must be passed explicitly (same trap as dump_hlo,
    # PERF.md "LLFF floor, audited").
    PROTO_HW = {
        "dtu_eval": [512, 640],
        "llff_eval": [640, 960],
        "nerf_eval": [800, 800],
    }
    results = {}
    for name in args.cfgs:
        hw = PROTO_HW.get(name)
        cfg = load_cfg(
            f"configs/{name}.yaml",
            ["synthetic", "True", "compute_dtype", "bfloat16"]
            + (["synthetic_hw", repr(hw)] if hw else []),
        )
        network = make_network(cfg)
        loader = make_data_loader(cfg, is_train=False)
        max_level = int(cfg.nerf.max_mipmap_level)
        variables = None
        it = iter(loader)
        del stash[:]
        for _ in range(args.scenes):
            batch = next(it)
            if variables is None:
                variables = init_network(network, cfg, sample_batch=batch)
            dev = to_device(batch)
            ret, _, _ = jax.jit(
                lambda v, b: network.apply(v, b, train=False)
            )(variables, dev)
            force_sync(ret["rgb"].mean())

        lods = np.concatenate([l.reshape(-1) for l in stash])
        clipped = np.clip(lods, 0.0, float(max_level))
        hist, edges = np.histogram(
            clipped, bins=[-0.01] + [i * 0.5 for i in range(2 * max_level + 1)]
        )
        frac = clipped - np.floor(clipped)
        res = {
            "max_level": max_level,
            "n": int(lods.size),
            "raw_min": float(lods.min()),
            "raw_max": float(lods.max()),
            "mean": float(clipped.mean()),
            "frac_le_0": float((lods <= 0.0).mean()),
            "frac_lt_1": float((clipped < 1.0).mean()),
            "frac_ge_max": float((lods >= max_level).mean()),
            "frac_frac_lt_0.05": float((frac < 0.05).mean()),
            "hist_halves": {
                f"[{edges[i]:.1f},{edges[i+1]:.1f})": int(hist[i])
                for i in range(len(hist))
            },
        }
        results[name] = res
        print(name, json.dumps(res, indent=1), flush=True)

    print(json.dumps({k: {kk: vv for kk, vv in v.items() if kk != "hist_halves"}
                      for k, v in results.items()}))


if __name__ == "__main__":
    main()
