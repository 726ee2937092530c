"""Dump the optimized HLO of the fused eval forward and summarize it.

The DCE-ablation marginals (tools/ablate_frame.py) say where the
milliseconds are; this tool says WHY — which ops XLA actually fused and
which intermediate buffers materialize in HBM.  It compiles the same
forward bench.py times, saves the optimized HLO text, and prints:

  - the largest HLO buffer allocations (the HBM traffic the frame pays)
  - every gather/scatter and whether it sits inside a fusion
  - fusion count / kind histogram

Usage: python tools/dump_hlo.py [--cfg configs/dtu_eval.yaml]
       [--out /tmp/frame_hlo.txt] [--set k v ...]
Compile is remote and slow (~15 min); no timing is done.
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cfg", default="configs/dtu_eval.yaml")
    ap.add_argument("--out", default="/tmp/frame_hlo.txt")
    ap.add_argument("--set", nargs="*", default=[])
    ap.add_argument("--dtype", default="bfloat16")
    args = ap.parse_args()

    from gdb_nerf_tpu.runtime import cache

    cache.enable()
    import jax

    from gdb_nerf_tpu.config import load_cfg
    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.runtime import make_network
    from gdb_nerf_tpu.runtime.renderer import init_network, to_device

    cfg = load_cfg(
        args.cfg,
        ["synthetic", "True", "compute_dtype", args.dtype] + list(args.set),
    )
    network = make_network(cfg)
    loader = make_data_loader(cfg, is_train=False)
    batch = next(iter(loader))
    variables = init_network(network, cfg, sample_batch=batch)
    dev = to_device(batch)

    def fwd(v, b):
        ret, _, _ = network.apply(v, b, train=False)
        return ret["rgb"]

    print("lowering + compiling (remote, be patient)...", flush=True)
    compiled = jax.jit(fwd).lower(variables, dev).compile()
    txt = compiled.as_text()
    with open(args.out, "w") as f:
        f.write(txt)
    print(f"optimized HLO -> {args.out}  ({len(txt) / 1e6:.1f} MB)", flush=True)

    # --- buffer summary: parse shapes of non-fused root ops (each HLO
    # instruction at module scope owns an output buffer) ---
    dtype_bytes = {
        "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
        "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8, "s64": 8,
    }

    def shape_bytes(shape_str):
        m = re.match(r"(\w+)\[([\d,]*)\]", shape_str)
        if not m:
            return 0
        dt, dims = m.groups()
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        return n * dtype_bytes.get(dt, 4)

    # Instructions look like: "  %name = bf16[1,256,320,8]{...} op-name(...)"
    inst_re = re.compile(
        r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+((?:\([^)]*\))|(?:\w+\[[\d,]*\]))\S*\s+([\w\-]+)\(",
        re.M,
    )
    top = []
    op_hist = collections.Counter()
    gathers = []
    in_fusion = None
    for line in txt.splitlines():
        if re.match(r"^\s*%fused_", line) or re.match(r"^%fused_", line):
            in_fusion = line.strip().split(" ")[0]
        if re.match(r"^ENTRY|^}", line):
            in_fusion = None
        m = inst_re.match(line)
        if not m:
            continue
        name, shape, op = m.groups()
        op_hist[op] += 1
        if shape.startswith("("):
            continue
        b = shape_bytes(shape)
        if op == "fusion" or (in_fusion is None and op not in ("parameter", "constant")):
            top.append((b, name, shape, op))
        if op in ("gather", "scatter", "dynamic-gather"):
            gathers.append((in_fusion, name, shape, b))

    # --- the floor audit (PERF.md "Roofline"): what the compiled graph
    # actually moves, vs the hand-summed ~1 GB estimate ---
    try:
        ca = compiled.cost_analysis()
        ca = ca[0] if isinstance(ca, (list, tuple)) else ca
        print("\n== XLA cost analysis (compiled graph) ==")
        for k in sorted(ca):
            if "bytes" in k or k in ("flops", "transcendentals"):
                v = ca[k]
                if isinstance(v, float) and v > 1e6:
                    print(f"  {k:<28} {v / 1e9:10.3f} G")
                else:
                    print(f"  {k:<28} {v}")
    except Exception as e:
        print(f"cost_analysis unavailable: {e}")
    try:
        ma = compiled.memory_analysis()
        print("\n== memory analysis ==")
        for k in ("temp_size_in_bytes", "argument_size_in_bytes",
                  "output_size_in_bytes", "generated_code_size_in_bytes"):
            print(f"  {k:<28} {getattr(ma, k, None)}")
    except Exception as e:
        print(f"memory_analysis unavailable: {e}")

    total_buf = sum(b for b, *_ in top)
    gather_rows = 0
    for _, _, shape, _ in gathers:
        m = re.match(r"\w+\[([\d,]*)\]", shape)
        if m and m.group(1):
            dims = [int(d) for d in m.group(1).split(",")]
            # rows = product of all but the trailing (lane/channel) dim
            n = 1
            for d in dims[:-1]:
                n *= d
            gather_rows += n
    print(f"\n== totals ==")
    print(f"  materialized buffer bytes (sum of top-level outputs): "
          f"{total_buf / 1e9:.3f} GB")
    print(f"  gather output rows (upper bound on fetched rows): "
          f"{gather_rows / 1e6:.2f} M")

    top.sort(reverse=True)
    print("\n== largest materialized buffers (top 25) ==")
    for b, name, shape, op in top[:25]:
        print(f"  {b / 2**20:9.1f} MiB  {op:<12} {shape:<28} {name[:60]}")

    print("\n== gathers ==")
    for fus, name, shape, b in gathers[:40]:
        where = f"inside {fus}" if fus else "TOP-LEVEL (unfused)"
        print(f"  {b / 2**20:9.1f} MiB  {shape:<28} {where}  {name[:50]}")
    print(f"  total gathers: {len(gathers)}")

    print("\n== op histogram (top 15) ==")
    for op, c in op_hist.most_common(15):
        print(f"  {op:<22} {c}")


if __name__ == "__main__":
    main()
