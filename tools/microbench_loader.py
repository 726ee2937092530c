"""Loader-throughput microbench: images/s for the host decode path.

The 30 fps DTU target implies a ~33 ms frame budget; each eval frame needs
V=3 source images decoded + resized on the host (overlapped with device
compute by the loader's worker threads, but the *rate* must clear the
budget).  This benchmarks the native C++ decode core (native/gdbn_io.cpp)
against the cv2 fallback on reference-shaped inputs:

  DTU rectified frames: 512x640 PNG (dtu.py reads rect_*_3_r5000.png)
  and the PFM depth read (0.5x pooled, as datasets/dtu.py does).

Usage: python tools/microbench_loader.py [--n 60]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import cv2
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from gdb_nerf_tpu.datasets import native  # noqa: E402
from gdb_nerf_tpu.utils.io import write_pfm  # noqa: E402


def _mk_png(path: str, h: int, w: int, rng) -> None:
    img = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
    cv2.imwrite(path, img)


def bench(fn, n: int) -> float:
    fn()  # warm
    t0 = time.perf_counter()
    for _ in range(n):
        fn()
    return (time.perf_counter() - t0) / n


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=60)
    args = ap.parse_args()
    rng = np.random.default_rng(0)

    with tempfile.TemporaryDirectory() as td:
        png = os.path.join(td, "rect.png")
        _mk_png(png, 512, 640, rng)
        pfm = os.path.join(td, "d.pfm")
        write_pfm(pfm, rng.uniform(400, 900, (1024, 1280)).astype(np.float32))

        rows = []

        def report(name, sec_per, note=""):
            rows.append((name, sec_per))
            print(f"{name:<34s} {sec_per * 1e3:7.2f} ms  {1.0 / sec_per:8.1f}/s  {note}")

        t = bench(lambda: cv2.imread(png), args.n)
        report("cv2.imread 512x640 png", t)
        if native.available():
            t = bench(lambda: native.decode_image(png), args.n)
            report("native decode 512x640 png", t)
            pool = native.DecodePool(num_threads=4)

            def pooled():
                for _ in range(4):
                    pool.submit(png, (512, 640))
                pool.wait()

            t = bench(pooled, max(args.n // 4, 8)) / 4
            report("native pooled decode (4 threads)", t, "per image")
        t = bench(lambda: cv2.imread(pfm, cv2.IMREAD_UNCHANGED), args.n)

        if native.available():
            t = bench(lambda: native.read_pfm(pfm), args.n)
            report("native read_pfm 1024x1280", t)

        # Frame budget: V=3 source decodes per eval frame.
        best_decode = min(s for n_, s in rows if "decode" in n_)
        frame_ms = 3 * best_decode * 1e3
        print(
            f"\nper-frame host decode (V=3): {frame_ms:.2f} ms "
            f"vs 33 ms budget at 30 fps -> "
            f"{'OK (overlapped: ' + f'{33 / frame_ms:.1f}x headroom)' if frame_ms < 33 else 'OVER BUDGET'}"
        )


if __name__ == "__main__":
    main()
