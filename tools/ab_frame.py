"""Same-process interleaved A/B of a module-level perf flag on the frame.

Run-to-run noise on the shared dev chip is +-2-3 ms, which swamps 1-2 ms
effects when A and B are measured in separate processes (possibly hours
apart).  This tool compiles BOTH variants of the eval frame in one process
(flipping the flag between traces — the module globals are read at trace
time) and interleaves timing rounds A,B,A,B,... so both see the same chip
conditions.  Reports per-variant best and per-round deltas.

Usage: python tools/ab_frame.py --flag cv_barrier [--rounds 5] [--n 8]
       [--cfg configs/dtu_eval.yaml] [--set k v ...]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# flag name -> (module path, attribute).  The attribute is flipped between
# traces; both variants must produce identical outputs (exactness is the
# flag owner's contract, e.g. optimization_barrier is semantically a no-op).
FLAGS = {
    "cv_barrier": ("gdb_nerf_tpu.ops.cost_volume", "_CV_BARRIER"),
    "cv_flat": ("gdb_nerf_tpu.ops.cost_volume", "_CV_FLAT"),
    "mipbuild": ("gdb_nerf_tpu.models.network", "_MIPBUILD_FUSED"),
    # string-valued: off="pair", on="stack"
    "tent": ("gdb_nerf_tpu.ops.grid_sample", "_TENT"),
    "enc_flat": ("gdb_nerf_tpu.ops.bundles", "_ENC_FLAT"),
    "vox_tent": ("gdb_nerf_tpu.ops.bundles", "_VOX_TENT"),
    "mip_pair": ("gdb_nerf_tpu.ops.mip", "_PAIR"),
    # NOT exact by contract: bit-exact only where the protocol's LOD
    # population sits at lod <= 0 (tools/measure_lod.py) — read the
    # printed |off-on| as the check for the bench scene.
    "mip_l0": ("gdb_nerf_tpu.ops.mip", "_L0"),
    # Exact for lod < 1 (every protocol measures |lod| < 0.03).
    "mip_01": ("gdb_nerf_tpu.ops.mip", "_01"),
    # int-valued: off=0 (per-member 2x2 rows), on=6 (6x6 shared patch).
    # NOT exact by contract: members whose footprints overflow the patch
    # clamp to its edge — read the printed |off-on| as the approximation
    # error, not a bug.
    "member_patch": ("gdb_nerf_tpu.ops.bundles", "_MEMBER_PATCH"),
}
FLAG_VALUES = {"tent": ("pair", "stack"), "member_patch": (0, 6)}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--flag", required=True, choices=sorted(FLAGS))
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cfg", default="configs/dtu_eval.yaml")
    ap.add_argument("--set", nargs="*", default=[])
    args = ap.parse_args()

    from gdb_nerf_tpu.runtime import cache

    cache.enable()
    import importlib

    import jax
    import jax.numpy as jnp
    import numpy as np

    from gdb_nerf_tpu.config import load_cfg
    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.runtime import make_network
    from gdb_nerf_tpu.runtime.renderer import force_sync, init_network, to_device

    mod_path, attr = FLAGS[args.flag]
    mod = importlib.import_module(mod_path)

    cfg = load_cfg(
        args.cfg,
        ["synthetic", "True", "compute_dtype", args.dtype] + list(args.set),
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

    off_on = FLAG_VALUES.get(args.flag, (False, True))
    variants = {}
    outs = {}
    for val in off_on:
        setattr(mod, attr, val)
        fn = jax.jit(run_n, static_argnums=0)
        out = fn(args.n)  # compile + warm
        force_sync(out)
        outs[val] = out
        variants[val] = fn
    setattr(mod, attr, off_on[0])
    print(f"exactness: |off - on| = {abs(float(outs[off_on[0]]) - float(outs[off_on[1]])):.3e}")

    times = {off_on[0]: [], off_on[1]: []}
    for r in range(args.rounds):
        for val in off_on:
            t0 = time.time()
            force_sync(variants[val](args.n))
            times[val].append((time.time() - t0) / args.n * 1000.0)
        print(
            f"round {r}: off {times[off_on[0]][-1]:.1f} ms  "
            f"on {times[off_on[1]][-1]:.1f} ms  "
            f"delta {times[off_on[1]][-1] - times[off_on[0]][-1]:+.1f} ms",
            flush=True,
        )
    off = np.array(times[off_on[0]])
    on = np.array(times[off_on[1]])
    print(
        f"{args.flag}: off best {off.min():.1f} / median {np.median(off):.1f} ms"
        f"  on best {on.min():.1f} / median {np.median(on):.1f} ms"
        f"  median delta {np.median(on - off):+.2f} ms"
    )


if __name__ == "__main__":
    main()
