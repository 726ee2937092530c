"""Static bytes-moved / gather-row accounting for one eval frame.

Prints, per pipeline stage, the minimum HBM traffic (activation reads +
writes that cannot be fused away) and the gather-row count, then converts
them into latency floors for a given memory system.  Pure arithmetic over
the config shapes — no device needed — so the "maps to X ms on hardware Y"
claims in PERF.md / README are checkable line by line.

Model (constants measured on the dev chip, tools/microbench.py):
  * elementwise/copy bandwidth BW (read+write combined),
  * gather row rate RR (rows/s, independent of row width up to ~128 B),
  * gather streaming cap GBW for wide rows.

Floor per stage = max(bytes / BW, rows / RR, row_bytes / GBW).

Usage:
  python tools/roofline.py                      # dev-chip constants
  python tools/roofline.py --bw 819e9 --rr 8e9  # production v5e estimate
"""

from __future__ import annotations

import argparse


def fmt_mb(b):
    return f"{b / 1e6:8.1f} MB"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--size", type=int, nargs=2, default=[512, 640])
    ap.add_argument("--views", type=int, default=3)
    ap.add_argument("--samples", type=int, default=3)
    ap.add_argument("--bw", type=float, default=32e9,
                    help="elementwise r+w bandwidth (B/s); dev chip 32e9")
    ap.add_argument("--rr", type=float, default=250e6,
                    help="gather row rate (rows/s); dev chip 250e6")
    ap.add_argument("--gbw", type=float, default=60e9,
                    help="gather streaming bandwidth (B/s); dev chip 60e9")
    args = ap.parse_args()

    H, W = args.size
    V, S = args.views, args.samples
    b = 2  # bundle size
    bsq = b * b
    Hb, Wb = H // b, W // b
    e = 2  # bf16 bytes

    stages = []  # (name, bytes, rows, row_bytes)

    def stage(name, byts, rows=0, row_bytes=0):
        stages.append((name, byts, rows, row_bytes))

    # --- FPN: conv activation traffic (read in + write out per conv) ---
    fpn_acts = (
        2 * (H * W * 3) + 4 * (H * W * 8)          # c0 block x2
        + 2 * (H // 2 * W // 2 * 16) * 2            # c1 block
        + 2 * (H // 4 * W // 4 * 32) * 2            # c2 block
        + (H // 4 * W // 4) * (32 + 32)             # out0
        + (H // 2 * W // 2) * (32 + 32 + 16)        # lateral+out1
        + (H * W) * (32 + 32 + 8)                   # lateral+out2
    ) * V * e
    stage("FPN convs", fpn_acts)

    # --- cost volume stage0: D=64 @ (H/8, W/8), feats 1/4 res C=32 ---
    D0, h0, w0, C0 = 64, H // 8, W // 8, 32
    rows0 = V * D0 * h0 * w0
    rb0 = 4 * C0 * e
    cv0_bytes = (
        V * (H // 4) * (W // 4) * 4 * C0 * e        # pack write
        + rows0 * rb0                               # gathered rows read
        + 2 * D0 * h0 * w0 * C0 * 4                 # fp32 moment accumulators
        + D0 * h0 * w0 * C0 * e                     # variance out
    )
    stage("cost volume s0", cv0_bytes, rows0, rb0)

    # --- CostRegNetSmall s0 (C 8/16/32 over D0 x h0 x w0 pyramid) ---
    reg0 = 0
    dims = [(D0, h0, w0, 32), (D0, h0, w0, 8), (D0 // 2, h0 // 2, w0 // 2, 16),
            (D0 // 2, h0 // 2, w0 // 2, 16), (D0 // 4, h0 // 4, w0 // 4, 32),
            (D0 // 4, h0 // 4, w0 // 4, 32)]
    for (d, hh, ww, c) in dims:
        reg0 += 2 * d * hh * ww * c * e             # in+out per conv
    reg0 *= 2  # decoder mirrors encoder
    stage("CostRegSmall s0", reg0)

    # --- cost volume stage1: D=8 @ (H/2, W/2), feats 1/2 res C=16 ---
    D1, h1, w1, C1 = 8, H // 2, W // 2, 16
    rows1 = V * D1 * h1 * w1
    rb1 = 4 * C1 * e
    cv1_bytes = (
        V * h1 * w1 * 4 * C1 * e
        + rows1 * rb1
        + 2 * D1 * h1 * w1 * C1 * 4
        + D1 * h1 * w1 * C1 * e
    )
    stage("cost volume s1", cv1_bytes, rows1, rb1)

    # --- CostRegNet s1 ---
    reg1 = 0
    dims = [(D1, h1, w1, 16), (D1, h1, w1, 8), (D1 // 2, h1 // 2, w1 // 2, 16),
            (D1 // 2, h1 // 2, w1 // 2, 16), (D1 // 4, h1 // 4, w1 // 4, 32),
            (D1 // 4, h1 // 4, w1 // 4, 32), (1, h1 // 8, w1 // 8, 64),
            (1, h1 // 8, w1 // 8, 64)]
    for (d, hh, ww, c) in dims:
        reg1 += 2 * d * hh * ww * c * e
    reg1 *= 2
    stage("CostRegNet s1", reg1)

    # --- bundle sampling: (Hb, Wb, S) z/uvd/radii/valid tensors ---
    N = Hb * Wb * S
    stage("bundle sampling", N * (1 + 1 + 3 + 1 + 1) * 4 * 2)

    # --- encode ---
    F = 16 + 3  # mip feature width
    # member RGB: V * N * bsq rows of 2x2-packed RGB
    mrows = V * N * bsq
    mrb = 4 * 3 * e
    member_bytes = (
        V * H * W * 4 * 3 * e                        # pack write
        + mrows * mrb                                # rows read
        + mrows * (2 * 4 + 4)                        # coords + index
        + V * N * bsq * 3 * e                        # rgbs out
    )
    stage("encode: member rgb", member_bytes, mrows, mrb)
    # mip: 2 taps x V*N rows of 2x2-packed F channels
    prows = 2 * V * N
    prb = 4 * F * e
    pyr_texels = int(Hb * Wb * 4 / 3)
    mip_bytes = (
        V * pyr_texels * 4 * F * e                   # pyramid pack write
        + prows * prb
        + prows * (2 * 4 + 4)
        + V * N * F * e                              # mip_feat out
    )
    stage("encode: mip fetch", mip_bytes, prows, prb)
    # vox: degenerate depth-linear fetch, 2 narrow rows per sample
    vrows = 2 * N
    vrb = 8 * e
    stage("encode: vox fetch", vrows * vrb + N * 8 * e + N * 12, vrows, vrb)
    # projection / ray-diff elementwise (fp32 geometry)
    proj_bytes = V * N * (3 + 3 + 1 + 1 + 4) * 4 * 2
    stage("encode: proj+raydiff", proj_bytes)

    # --- NeRF head: split matmuls over (V, N) x ~hid ---
    hid = 64
    head_bytes = (
        V * N * (F + 4 + 12) * e * 2                 # per-view reads x2 passes
        + N * (hid + 8 + 16 + 31 + 8) * e * 2
    )
    stage("NeRF head", head_bytes)

    # --- composite + decoder ---
    stage("composite", N * (1 + 31 + 1) * e * 2)
    dec_acts = 0
    for c_in, c_out in [(28, 64)] + [(64, 64)] * 6 + [(64, 12)]:
        dec_acts += Hb * Wb * (c_in + c_out) * e
    stage("RDN decoder", dec_acts)

    total_b = total_r = total_floor = 0.0
    print(f"{'stage':<22} {'bytes':>12} {'Mrows':>7} {'floor ms':>9}")
    for name, byts, rows, rbts in stages:
        floor = max(byts / args.bw, rows / args.rr,
                    rows * rbts / args.gbw if rows else 0.0) * 1e3
        total_b += byts
        total_r += rows
        total_floor += floor
        print(f"{name:<22} {fmt_mb(byts)} {rows / 1e6:7.2f} {floor:9.2f}")
    print("-" * 52)
    print(f"{'TOTAL':<22} {fmt_mb(total_b)} {total_r / 1e6:7.2f} "
          f"{total_floor:9.2f}")
    print(f"\nassumptions: BW={args.bw / 1e9:.0f} GB/s  "
          f"RR={args.rr / 1e6:.0f} M rows/s  GBW={args.gbw / 1e9:.0f} GB/s")


if __name__ == "__main__":
    main()
