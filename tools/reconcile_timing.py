"""Reconcile bench.py vs tools/measure_frame.py (VERDICT round-4 task 3).

The two harnesses are the same timer (chained fori_loop + force_sync,
best-of-3) at different chain lengths: bench.py N=10, measure_frame N=8.
Round 4 reported 44.2 ms (bench) vs 43.2 ms (measure_frame) from runs hours
apart on the shared chip.  This tool compiles the same frame at N in
{8, 10, 20} in ONE process and interleaves timing rounds 8,10,20,8,10,...
so all three see identical chip conditions, then reports:

  * per-N per-frame time t(N)/N  — what each harness would print
  * the pairwise marginal frame time (t(N2)-t(N1))/(N2-N1) — the true
    per-iteration device time with the fixed overhead differenced out
  * the implied fixed overhead per launch t(N) - N*marginal

If t(10)/10 and t(8)/8 agree within the run-to-run spread, the round-4 gap
was shared-chip noise; the headline number is bench.py's protocol
(reference protocol: /root/reference/run.py:54-73).

Usage: python tools/reconcile_timing.py [--rounds 5] [--dtype bfloat16]
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
    ap.add_argument("--rounds", type=int, default=5)
    ap.add_argument("--ns", type=int, nargs="*", default=[8, 10, 20])
    ap.add_argument("--cfg", default="configs/dtu_eval.yaml")
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
        args.cfg, ["synthetic", "True", "compute_dtype", args.dtype]
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
    for n in args.ns:
        t0 = time.time()
        force_sync(g(n))
        print(f"compiled+warm N={n} in {time.time()-t0:.0f}s", flush=True)

    times: dict[int, list[float]] = {n: [] for n in args.ns}
    for r in range(args.rounds):
        for n in args.ns:
            t0 = time.time()
            force_sync(g(n))
            times[n].append(time.time() - t0)
        print(
            f"round {r}: "
            + " ".join(f"N={n}:{times[n][-1]*1e3:.1f}ms" for n in args.ns),
            flush=True,
        )

    best = {n: min(ts) for n, ts in times.items()}
    med = {n: sorted(ts)[len(ts) // 2] for n, ts in times.items()}
    out = {
        "per_frame_best_ms": {n: round(best[n] / n * 1e3, 2) for n in args.ns},
        "per_frame_median_ms": {n: round(med[n] / n * 1e3, 2) for n in args.ns},
    }
    ns = sorted(args.ns)
    marg = {}
    for i in range(len(ns)):
        for j in range(i + 1, len(ns)):
            n1, n2 = ns[i], ns[j]
            m = (best[n2] - best[n1]) / (n2 - n1)
            marg[f"{n1}->{n2}"] = round(m * 1e3, 2)
    out["marginal_frame_ms_best"] = marg
    if len(ns) >= 2:
        m = marg[f"{ns[0]}->{ns[-1]}"] / 1e3
        out["fixed_overhead_ms"] = {
            n: round((best[n] - n * m) * 1e3, 2) for n in args.ns
        }
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
