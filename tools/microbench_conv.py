"""Conv-lowering microbenchmarks: why do small-channel convs run at 0.09 TF/s?

Compares, at matched output bytes: XLA conv vs explicit im2col matmul vs
plain matmul, NHWC vs NCHW-ish layouts, and conv with lane-aligned channel
counts.  Informs whether the FPN / cost-reg / decoder conv stages should be
re-expressed (exactly) as packed matmuls.

Usage: python tools/microbench_conv.py
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from microbench import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp

    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)

    H, W = 512, 640

    def conv2d(x, k, dn=("NHWC", "HWIO", "NHWC")):
        return jax.lax.conv_general_dilated(
            x, k, (1, 1), [(1, 1), (1, 1)], dimension_numbers=dn
        )

    # 1. baseline: C8 conv at full res (the FPN shape)
    x8 = jax.random.normal(key, (1, H, W, 8), jnp.bfloat16)
    k8 = jax.random.normal(key, (3, 3, 8, 8), jnp.bfloat16)
    ms = chain_time(lambda v: conv2d(v, k8), x8, iters=5)
    print(f"conv3x3 NHWC C8->C8 {H}x{W}: {ms:8.2f} ms", flush=True)

    # 2. same op as im2col matmul: unfold 3x3 neighborhoods -> (HW, 72) @ (72, 8)
    k_mat = k8.reshape(72, 8)

    def im2col_mm(v):
        pads = jnp.pad(v, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [
            pads[:, dy : dy + H, dx : dx + W, :]
            for dy in range(3)
            for dx in range(3)
        ]
        patches = jnp.concatenate(cols, axis=-1)  # (1, H, W, 72)
        return jnp.dot(
            patches.reshape(-1, 72), k_mat, preferred_element_type=jnp.float32
        ).astype(jnp.bfloat16)

    ms = chain_time(im2col_mm, x8, iters=5)
    print(f"im2col matmul  C8->C8 {H}x{W}: {ms:8.2f} ms", flush=True)

    # 3. plain matmuls at the same row count
    for Cin, Cout in [(72, 8), (128, 128)]:
        a = jax.random.normal(key, (H * W, Cin), jnp.bfloat16)
        bm = jax.random.normal(key, (Cin, Cout), jnp.bfloat16)
        ms = chain_time(
            lambda v: jnp.dot(v, bm, preferred_element_type=jnp.float32).astype(
                jnp.bfloat16
            ),
            a,
            iters=5,
        )
        print(f"matmul ({H * W}x{Cin})@({Cin}x{Cout}): {ms:8.2f} ms", flush=True)

    # 4. conv with lane-width channels at 1/4 the spatial size (same bytes)
    x128 = jax.random.normal(key, (1, H // 4, W // 4, 128), jnp.bfloat16)
    k128 = jax.random.normal(key, (3, 3, 128, 128), jnp.bfloat16)
    ms = chain_time(lambda v: conv2d(v, k128), x128, iters=5)
    print(f"conv3x3 NHWC C128 {H // 4}x{W // 4}: {ms:8.2f} ms", flush=True)

    # 5. stride-2 5x5 C8->C16 (the FPN downsample shape)
    k5 = jax.random.normal(key, (5, 5, 8, 16), jnp.bfloat16)

    def conv5s2(v):
        return jax.lax.conv_general_dilated(
            v, k5, (2, 2), [(2, 2), (2, 2)],
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    ms = chain_time(conv5s2, x8, iters=5)
    print(f"conv5x5s2 C8->C16 {H}x{W}: {ms:8.2f} ms", flush=True)

    # 6. grouped pointwise: does a 1x1 conv (pure matmul shape) beat 3x3?
    k1 = jax.random.normal(key, (1, 1, 8, 8), jnp.bfloat16)
    ms = chain_time(lambda v: conv2d(v, k1), x8, iters=5)
    print(f"conv1x1 NHWC C8->C8 {H}x{W}: {ms:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
