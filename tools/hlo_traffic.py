"""HBM-traffic audit of an optimized-HLO dump (PERF.md floor audit).

tools/dump_hlo.py saves the optimized HLO text of the eval frame; this tool
turns that text into a defensible HBM-traffic model — the number the
"~1 GB logical -> 45 ms floor" roofline claim (PERF.md) hand-summed.

Method, per ENTRY instruction (the frame is fully unrolled — no while
loops, verified):
  - bitcast / get-tuple-element / tuple are aliases: zero traffic,
    resolved transitively to their source buffer.
  - parameter / constant / iota produce no write traffic (weights count as
    reads at their consumers).
  - every other op WRITES its output buffer once and READS each distinct
    operand buffer once.  That is exactly XLA's fusion contract: fusion
    internals stay in registers/VMEM, fusion boundaries are HBM.
  - copy-start/copy-done pairs are parameter prefetches into SMEM/VMEM
    (S(1) space annotations); counted once, tiny.

Two totals are reported:
  - LOGICAL bytes: dtype * prod(dims).
  - PHYSICAL bytes: padded per the buffer's TPU tiled layout — T(8,128)
    pads the most-minor dim to 128 lanes and the second-most-minor to 8
    sublanes.  A bf16[...,3,76] buffer physically occupies (8,128) tiles,
    4.5x its logical bytes; vector loads/stores move whole tiles, so
    PHYSICAL is what the HBM bus actually carries.

Per-stage attribution comes from metadata op_name scopes
(feature_net / depth_net / nerf / upsampler / glue).

Usage: python tools/hlo_traffic.py /tmp/frame_hlo_r4.txt [--ms 45.3] [--top 30]
"""

from __future__ import annotations

import argparse
import collections
import re

DTYPE_BYTES = {
    "f32": 4, "bf16": 2, "f16": 2, "s32": 4, "u32": 4, "s8": 1,
    "u8": 1, "pred": 1, "s16": 2, "u16": 2, "f64": 8, "s64": 8,
}
# *-done ops are completion waits on the matching *-start — the traffic is
# counted at the start; they alias its buffer.
ALIAS_OPS = {"bitcast", "get-tuple-element", "tuple", "copy-done",
             "async-done", "all-gather-done", "collective-permute-done"}
NO_WRITE_OPS = {"parameter", "constant", "iota", "after-all"}
# Ops that read only the region they produce, not their whole operand.
SLICED_READ_OPS = {"slice", "dynamic-slice"}

SHAPE_RE = re.compile(
    r"(\w+)\[([\d,]*)\](?:\{([\d,]*)"  # dtype [dims] {minor2major
    r"(?::T\((\d+),(\d+)\))?"          # :T(a,b)
    r"[^}]*\})?"                       # packing/space suffix
)


def shape_sizes(shape_str: str) -> tuple[int, int]:
    """(logical, physical) bytes of one array shape incl. layout padding."""
    m = SHAPE_RE.match(shape_str)
    if not m:
        return 0, 0
    dt, dims_s, m2m_s, t_a, t_b = m.groups()
    eb = DTYPE_BYTES.get(dt, 4)
    dims = [int(d) for d in dims_s.split(",") if d]
    logical = eb
    for d in dims:
        logical *= d
    if not dims:
        return eb, eb
    phys_dims = list(dims)
    if t_a and m2m_s:
        m2m = [int(d) for d in m2m_s.split(",") if d]
        ta, tb = int(t_a), int(t_b)
        minor = m2m[0]
        phys_dims[minor] = -(-phys_dims[minor] // tb) * tb
        if len(m2m) > 1:
            second = m2m[1]
            phys_dims[second] = -(-phys_dims[second] // ta) * ta
    physical = eb
    for d in phys_dims:
        physical *= d
    return logical, physical


def tuple_sizes(sig: str, skip_onchip: bool = True) -> tuple[int, int]:
    """Sum element sizes of a tuple signature.

    Elements annotated S(1)/S(2) live in on-chip scratch/semaphore space —
    they are not HBM buffers and are skipped by default.
    """
    lo = ph = 0
    for part in re.finditer(r"\w+\[[\d,]*\](?:\{[^}]*\})?", sig):
        if skip_onchip and re.search(r"S\(\d\)", part.group(0)):
            continue
        l, p = shape_sizes(part.group(0))
        lo += l
        ph += p
    return lo, ph


INST_RE = re.compile(
    r"^\s+(?:ROOT\s+)?%?([\w.\-]+)\s+=\s+"
    r"((?:\([^=]*?\))|(?:\w+\[[\d,]*\](?:\{[^}]*\})?))\s+"
    r"([\w\-]+)\((.*)$"
)


SRC_RE = re.compile(r'source_file="([^"]+)" source_line=(\d+)')


def src_of(meta_line: str) -> str:
    m = SRC_RE.search(meta_line)
    if not m:
        return "(no metadata)"
    path = m.group(1)
    short = path.split("/root/repo/")[-1]
    return f"{short}:{m.group(2)}"


def stage_of(meta_line: str) -> str:
    m = re.search(r'op_name="jit\(\w+\)/Network/(\w+)', meta_line)
    if not m:
        return "glue"
    s = m.group(1)
    return s if s in ("feature_net", "depth_net", "nerf", "upsampler",
                      "decoder", "mvs") else "glue"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("hlo", help="optimized HLO text from tools/dump_hlo.py")
    ap.add_argument("--ms", type=float, default=None,
                    help="measured frame ms -> implied GB/s")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    txt = open(args.hlo).read()
    # ENTRY is the last computation in the dump.
    entry = txt[txt.rindex("ENTRY "):]

    size = {}      # name -> (logical, physical) of its owned buffer
    alias = {}     # name -> source name
    rows = []      # (name, op, operands, logical, physical, stage)
    for line in entry.splitlines():
        m = INST_RE.match(line)
        if not m:
            continue
        name, sig, op, rest = m.groups()
        if sig.startswith("("):
            lo, ph = tuple_sizes(sig)
            if op.endswith("-start"):
                # Prefetch into on-chip space: the HBM bytes moved are the
                # S()-annotated destination elements if present (read that
                # many bytes from HBM), else the full (src+dst) tuple for
                # HBM->HBM async copies.
                s_lo, s_ph = tuple_sizes(sig, skip_onchip=False)
                on_lo, on_ph = s_lo - lo, s_ph - ph
                if on_lo > 0:
                    lo, ph = on_lo, on_ph
        else:
            lo, ph = shape_sizes(sig)
        if re.match(r"\w+\[[\d,]*\]\{[^}]*S\(\d\)", sig):
            lo = ph = 0  # whole buffer lives on-chip
        size[name] = (lo, ph)
        # operand tokens: %names inside the first paren group
        depth = 1
        end = 0
        for i, ch in enumerate(rest):
            if ch == "(":
                depth += 1
            elif ch == ")":
                depth -= 1
                if depth == 0:
                    end = i
                    break
        operands = re.findall(r"%([\w.\-]+)", rest[:end])
        if op in ALIAS_OPS:
            if operands:
                alias[name] = operands[0]
            continue
        if op in NO_WRITE_OPS:
            continue
        rows.append((name, op, operands, lo, ph, stage_of(line), src_of(line)))

    def resolve(n):
        seen = set()
        while n in alias and n not in seen:
            seen.add(n)
            n = alias[n]
        return n

    w_lo = w_ph = r_lo = r_ph = 0
    by_stage = collections.defaultdict(lambda: [0, 0])
    by_op = collections.defaultdict(lambda: [0, 0])
    by_src = collections.defaultdict(lambda: [0, 0, 0])  # lo, ph, count
    contrib = []
    for name, op, operands, lo, ph, stage, src in rows:
        reads_lo = reads_ph = 0
        if op.endswith("-start"):
            pass  # start-op traffic fully captured in its write size
        elif op in SLICED_READ_OPS:
            reads_lo, reads_ph = lo, ph  # reads only the produced region
        elif op == "dynamic-update-slice" and len(operands) >= 2:
            # in-place: reads + writes only the update region
            upd = resolve(operands[1])
            reads_lo, reads_ph = size.get(upd, (0, 0))
            lo, ph = reads_lo, reads_ph
        else:
            for o in {resolve(o) for o in operands}:
                l, p = size.get(o, (0, 0))
                reads_lo += l
                reads_ph += p
        w_lo += lo
        w_ph += ph
        r_lo += reads_lo
        r_ph += reads_ph
        t = ph + reads_ph
        by_stage[stage][0] += lo + reads_lo
        by_stage[stage][1] += t
        by_op[op][0] += lo + reads_lo
        by_op[op][1] += t
        by_src[src][0] += lo + reads_lo
        by_src[src][1] += t
        by_src[src][2] += 1
        contrib.append((t, lo + reads_lo, name, op, stage))

    tot_lo, tot_ph = w_lo + r_lo, w_ph + r_ph
    print(f"ENTRY instructions with traffic: {len(rows)}")
    print(f"writes: logical {w_lo/1e9:7.3f} GB   physical {w_ph/1e9:7.3f} GB")
    print(f"reads:  logical {r_lo/1e9:7.3f} GB   physical {r_ph/1e9:7.3f} GB")
    print(f"TOTAL:  logical {tot_lo/1e9:7.3f} GB   physical {tot_ph/1e9:7.3f} GB")
    if args.ms:
        print(f"implied bandwidth at {args.ms} ms: "
              f"logical {tot_lo/1e9/(args.ms/1e3):6.1f} GB/s   "
              f"physical {tot_ph/1e9/(args.ms/1e3):6.1f} GB/s")

    print("\n== by stage (logical GB / physical GB) ==")
    for s, (l, p) in sorted(by_stage.items(), key=lambda kv: -kv[1][1]):
        print(f"  {s:<14} {l/1e9:7.3f} / {p/1e9:7.3f}")
    print("\n== by op kind (top 12, physical GB) ==")
    for op, (l, p) in sorted(by_op.items(), key=lambda kv: -kv[1][1])[:12]:
        print(f"  {op:<22} {l/1e9:7.3f} / {p/1e9:7.3f}")
    print(f"\n== top {args.top} source lines by physical traffic ==")
    for src, (l, p, n) in sorted(by_src.items(), key=lambda kv: -kv[1][1])[: args.top]:
        print(f"  {p/2**20:9.1f} MiB phys ({l/2**20:8.1f} logical, {n:4d} insts)  {src}")

    print(f"\n== top {args.top} instructions by physical traffic ==")
    contrib.sort(reverse=True)
    for t, l, name, op, stage in contrib[:args.top]:
        print(f"  {t/2**20:9.1f} MiB phys ({l/2**20:8.1f} logical)  "
              f"{op:<12} {stage:<12} {name[:55]}")


if __name__ == "__main__":
    main()
