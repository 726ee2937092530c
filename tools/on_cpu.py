"""Run any repo script on the CPU backend (optionally an N-device mesh).

The environment's sitecustomize registers the TPU PJRT plugin at
interpreter startup and force-selects it, so ``JAX_PLATFORMS=cpu`` alone
does NOT redirect plain scripts (tests are covered by tests/conftest.py,
which does the same jax.config override this wrapper does).  Backends
initialize lazily, so flipping jax.config before the target script's first
device touch is sufficient.

Usage:
  python tools/on_cpu.py [--devices N] <script.py> [script args...]
  python tools/on_cpu.py run.py --type network --cfg_file configs/dtu_eval.yaml synthetic True
"""

from __future__ import annotations

import os
import runpy
import sys


def main() -> None:
    argv = sys.argv[1:]
    n = 1
    if argv and argv[0] == "--devices":
        n = int(argv[1])
        argv = argv[2:]
    if not argv:
        print(__doc__)
        raise SystemExit(2)

    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={n}"
    ).strip()
    import jax

    jax.config.update("jax_platforms", "cpu")
    try:
        jax.config.update("jax_num_cpu_devices", n)
    except Exception:
        pass  # older jax: the XLA flag above handles it

    script = argv[0]
    sys.argv = argv
    sys.path.insert(0, os.path.dirname(os.path.abspath(script)))
    runpy.run_path(script, run_name="__main__")


if __name__ == "__main__":
    main()
