"""Smoke: the static roofline accounting runs and totals are sane."""

import subprocess
import sys
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_roofline_runs_and_totals():
    out = subprocess.run(
        [sys.executable, os.path.join(ROOT, "tools", "roofline.py")],
        capture_output=True, text=True, check=True,
    ).stdout
    assert "TOTAL" in out
    total_line = [l for l in out.splitlines() if l.startswith("TOTAL")][0]
    # ~2.3 GB and ~7.9 M gather rows for the 512x640 V=3 S=3 frame; keep a
    # loose band so constant tweaks don't churn the test.
    mb = float(total_line.split()[1])
    assert 1000 < mb < 5000
    rows = float(total_line.split()[3])
    assert 5 < rows < 12


def test_roofline_scales_with_bandwidth():
    def floor(bw):
        out = subprocess.run(
            [sys.executable, os.path.join(ROOT, "tools", "roofline.py"),
             "--bw", str(bw), "--rr", "8e9", "--gbw", str(bw)],
            capture_output=True, text=True, check=True,
        ).stdout
        total_line = [l for l in out.splitlines() if l.startswith("TOTAL")][0]
        return float(total_line.split()[-1])

    assert floor(819e9) < floor(32e9) / 10
