"""Interleaved A/B of XLA compiler options on the eval frame.

Same statistical design as ab_frame.py (both variants compiled in ONE
process, timing rounds interleaved so they share chip conditions), but the
variant axis is a per-compile XLA option dict instead of a module flag:
``jit(f).lower(...).compile(compiler_options={...})`` reaches the TPU
compiler's knobs (scoped-VMEM limit, scheduler toggles, ...) without
process-wide XLA_FLAGS — the only remaining untried lever class after
round 5 A/B'd out every structural candidate (PERF.md "closing
statement").

Usage:
  python tools/ab_compiler_opts.py --opt xla_tpu_scoped_vmem_limit_kib=65536
  python tools/ab_compiler_opts.py \
      --variant vmem32:xla_tpu_scoped_vmem_limit_kib=32768 \
      --variant scav:xla_tpu_scavenge_vmem_for_fusions=true
  python tools/ab_compiler_opts.py --probe   # just check which names parse
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Candidate options worth probing on this toolchain (names from public XLA;
# availability depends on the installed libtpu/axon build).
PROBE_NAMES = [
    "xla_tpu_scoped_vmem_limit_kib=32768",
    "xla_tpu_enable_latency_hiding_scheduler=false",
    "xla_tpu_memory_limit_slop_factor=95",
    "xla_tpu_enable_dot_strength_reduction=false",
    "xla_tpu_licm_size_inflation_ratio=2.0",
    "xla_tpu_enable_aggressive_broadcast_priority_update=true",
]


def _parse_opts(pairs):
    out = {}
    for p in pairs:
        k, v = p.split("=", 1)
        out[k] = v
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--opt", nargs="+", default=[],
                    help="variant compiler options, key=value (single "
                    "variant named 'on')")
    ap.add_argument("--variant", action="append", default=[],
                    help="label:k=v[,k=v] — may repeat; all variants "
                    "compile in one process and interleave with baseline")
    ap.add_argument("--probe", action="store_true",
                    help="compile a tiny graph under each PROBE_NAMES "
                    "option and report accepted/rejected")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--cfg", default="configs/dtu_eval.yaml")
    ap.add_argument("--set", nargs="*", default=[])
    args = ap.parse_args()

    from gdb_nerf_tpu.runtime import cache

    cache.enable()
    import jax
    import jax.numpy as jnp
    import numpy as np

    if args.probe:
        tiny = jax.jit(lambda x: x * 2.0 + 1.0)
        for spec in PROBE_NAMES:
            opts = _parse_opts([spec])
            try:
                tiny.lower(jnp.ones((8, 128))).compile(compiler_options=opts)
                print(f"ACCEPTED  {spec}")
            except Exception as e:
                msg = str(e).splitlines()[0][:120]
                print(f"rejected  {spec}  ({msg})")
        return

    from gdb_nerf_tpu.config import load_cfg
    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.runtime import make_network
    from gdb_nerf_tpu.runtime.renderer import force_sync, init_network, to_device

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

    lowered = jax.jit(run_n, static_argnums=0).lower(args.n)
    variants = {}  # label -> opts dict
    if args.opt:
        variants["on"] = _parse_opts(args.opt)
    for spec in args.variant:
        label, rest = spec.split(":", 1)
        variants[label] = _parse_opts(rest.split(","))

    compiled = {"off": lowered.compile()}
    outs = {"off": None}
    for label, opts in variants.items():
        try:
            compiled[label] = lowered.compile(compiler_options=opts)
        except Exception as e:
            print(f"{label}: COMPILE FAILED {opts} "
                  f"({str(e).splitlines()[0][:120]})", flush=True)
    for label, fn in compiled.items():
        out = fn()  # warm
        force_sync(out)
        outs[label] = out
        if label != "off":
            print(f"{label}: {variants[label]}  exactness |off-{label}| = "
                  f"{abs(float(outs['off']) - float(out)):.3e}", flush=True)

    labels = list(compiled)
    times = {k: [] for k in labels}
    for r in range(args.rounds):
        for k in labels:
            t0 = time.time()
            force_sync(compiled[k]())
            times[k].append((time.time() - t0) / args.n * 1000.0)
        print("round %d: " % r + "  ".join(
            f"{k} {times[k][-1]:.1f}" for k in labels) + " ms", flush=True)
    off = np.array(times["off"])
    print(f"off: best {off.min():.1f} / median {np.median(off):.1f} ms")
    for k in labels[1:]:
        on = np.array(times[k])
        print(
            f"{k} {variants[k]}: best {on.min():.1f} / median "
            f"{np.median(on):.1f} ms  median delta "
            f"{np.median(on - off):+.2f} ms"
        )


if __name__ == "__main__":
    main()
