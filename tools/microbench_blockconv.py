"""A/B the space-to-depth blocked conv rewrite at the pipeline's real shapes.

Candidates (all stride-1 SAME convs on the inference path):
  FPN c0 convs        (3, 512, 640, 8->8)       — 2 of them
  FPN out2 conv       (3, 512, 640, 32->8)
  CostReg1 c0 conv3d  (1, 8, 256, 320, 16->8)
  CostReg1 head convs (1, 8, 256, 320, 8->8)
  CostReg0 c0 conv3d  (1, 64, 64, 80, 32->8)

Usage: python tools/microbench_blockconv.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from microbench import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gdb_nerf_tpu.ops.blockconv import conv2d_blocked, conv3d_blocked

    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)
    dt = jnp.bfloat16

    cases_2d = [
        ("fpn c0 8->8 @512x640", (3, 512, 640, 8), 8),
        ("fpn in 3->8 @512x640", (3, 512, 640, 3), 8),
        ("fpn out2 32->8 @512x640", (3, 512, 640, 32), 8),
        ("fpn c1 16->16 @256x320", (3, 256, 320, 16), 16),
    ]
    for name, shape, co in cases_2d:
        x = jax.random.normal(key, shape, dt)
        k = jax.random.normal(key, (3, 3, shape[-1], co), dt)
        ph = 1

        def plain(x, k=k):
            return lax.conv_general_dilated(
                x, k, (1, 1), ((ph, ph), (ph, ph)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )

        ms0 = chain_time(plain, x, iters=8)
        print(f"{name:<28} plain {ms0:7.2f} ms", flush=True)
        for s in (2, 4):
            def blocked(x, k=k, s=s):
                return conv2d_blocked(x, k, s)

            ms = chain_time(blocked, x, iters=8)
            print(f"{name:<28} s={s}   {ms:7.2f} ms", flush=True)

    cases_3d = [
        ("reg1 c0 16->8 @8x256x320", (1, 8, 256, 320, 16), 8),
        ("reg1 8->8 @8x256x320", (1, 8, 256, 320, 8), 8),
        ("reg0 c0 32->8 @64x64x80", (1, 64, 64, 80, 32), 8),
    ]
    for name, shape, co in cases_3d:
        x = jax.random.normal(key, shape, dt)
        k = jax.random.normal(key, (3, 3, 3, shape[-1], co), dt)

        def plain3(x, k=k):
            return lax.conv_general_dilated(
                x, k, (1, 1, 1), ((1, 1), (1, 1), (1, 1)),
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            )

        ms0 = chain_time(plain3, x, iters=8)
        print(f"{name:<28} plain {ms0:7.2f} ms", flush=True)
        for s in (2, 4):
            def blocked3(x, k=k, s=s):
                return conv3d_blocked(x, k, s)

            ms = chain_time(blocked3, x, iters=8)
            print(f"{name:<28} s={s}   {ms:7.2f} ms", flush=True)


if __name__ == "__main__":
    main()
