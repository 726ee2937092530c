"""A/B alternative lowerings for the pipeline's small-channel convs.

XLA's conv_general_dilated at C=8..32 runs far below both the MXU and the
copy bandwidth on this chip (PERF.md).  This benchmarks realistic in-graph
chains (6 convs with BN+ReLU between, amortizing per-jit overhead) of:

  xla      lax.conv_general_dilated (what the models use today)
  shifts   9-tap shift + (C_in x C_out) dot accumulation
  im2col   explicit patch extraction -> one (HW, 9C) @ (9C, C_out) matmul
  lanes2   2x2 space-to-lanes im2col: patches gathered from an s2d layout
           so the matmul K dim is 4x wider (see ops/blockconv.py history)

Each variant is numerically identical (same weights); correctness asserted
once at start.  Usage: python tools/microbench_conv_lowering.py [--c 8]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from microbench import chain_time  # noqa: E402


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--c", type=int, default=8)
    ap.add_argument("--size", type=int, nargs=2, default=[512, 640])
    ap.add_argument("--depth", type=int, default=6, help="convs per chain")
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--conv3d", type=int, default=0,
                    help="D extent: benchmark 3^3 volume convs instead")
    ap.add_argument("--deconv3d", type=int, default=0,
                    help="D extent: benchmark k3 s2 transposed convs instead")
    args = ap.parse_args()
    if args.deconv3d:
        bench_deconv(args)
        return
    if args.conv3d:
        bench_3d(args)
        return

    import jax
    import jax.numpy as jnp
    from jax import lax

    C = args.c
    H, W = args.size
    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, args.depth)
    Ws = [
        (jax.random.normal(k, (3, 3, C, C)) * (0.5 / C)).astype(dt) for k in ks
    ]
    x0 = jax.random.uniform(key, (H, W, C)).astype(dt)
    print(f"device: {jax.devices()[0]}  {H}x{W} C={C} depth={args.depth} {dt}",
          flush=True)

    def conv_xla(x, w):
        return lax.conv_general_dilated(
            x[None], w, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )[0]

    def conv_shifts(x, w):
        # pad once, then 9 shifted views each hit a (C, C) dot.
        xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
        out = None
        for dy in range(3):
            for dx in range(3):
                part = jnp.dot(
                    xp[dy : dy + H, dx : dx + W], w[dy, dx],
                    preferred_element_type=x.dtype,
                )
                out = part if out is None else out + part
        return out

    def conv_im2col(x, w):
        xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [xp[dy : dy + H, dx : dx + W] for dy in range(3) for dx in range(3)],
            axis=-1,
        )  # (H, W, 9C)
        return jnp.dot(
            cols, w.reshape(9 * C, C), preferred_element_type=x.dtype
        )

    def relu_bn(x):
        return jnp.maximum(x - x.mean(axis=(0, 1)), 0.0)

    def chain(conv):
        def f(x):
            for w in Ws:
                x = relu_bn(conv(x, w))
            return x

        return jax.jit(f)

    variants = {
        "xla": chain(conv_xla),
        "shifts": chain(conv_shifts),
        "im2col": chain(conv_im2col),
    }

    ref = np.asarray(variants["xla"](x0), np.float32)
    for name, f in variants.items():
        got = np.asarray(f(x0), np.float32)
        err = np.abs(got - ref).max()
        assert err < (0.1 if dt == jnp.bfloat16 else 1e-3), (name, err)

    for name, f in variants.items():
        ms = chain_time(f, x0, iters=8)
        per = ms / args.depth
        print(f"  {name:8s} {ms:8.2f} ms chain   {per:6.2f} ms/conv", flush=True)


def bench_deconv(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    from gdb_nerf_tpu.ops.fastconv import deconv_subpixel

    C = args.c
    D = args.deconv3d
    H, W = args.size
    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, args.depth)
    Ws = [
        (jax.random.normal(k, (3, 3, 3, C, C)) * (0.3 / C)).astype(dt)
        for k in ks
    ]
    x0 = jax.random.uniform(key, (D, H, W, C)).astype(dt)
    print(
        f"device: {jax.devices()[0]}  deconv3d {D}x{H}x{W} C={C} "
        f"depth={args.depth} {dt} (spatial doubles per layer)",
        flush=True,
    )

    def deconv_xla(x, w):
        return lax.conv_general_dilated(
            x[None], w, (1, 1, 1), [(1, 2)] * 3, lhs_dilation=(2, 2, 2),
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0]

    def pool(x):  # halve back so the chain keeps a fixed size
        d, h, w, c = x.shape
        return x.reshape(d // 2, 2, h // 2, 2, w // 2, 2, c).mean((1, 3, 5))

    def chain(deconv):
        def f(x):
            for w in Ws:
                x = pool(jnp.maximum(deconv(x, w), 0.0))
            return x

        return jax.jit(f)

    variants = {
        "xla": chain(deconv_xla),
        "subpixel": chain(lambda x, w: deconv_subpixel(x, w)),
    }
    ref = np.asarray(variants["xla"](x0), np.float32)
    for name, f in variants.items():
        got = np.asarray(f(x0), np.float32)
        err = np.abs(got - ref).max()
        assert err < (0.1 if dt == jnp.bfloat16 else 1e-3), (name, err)
    for name, f in variants.items():
        ms = chain_time(f, x0, iters=8)
        print(
            f"  {name:8s} {ms:8.2f} ms chain   {ms / args.depth:6.2f} ms/deconv",
            flush=True,
        )


def bench_3d(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    C = args.c
    D = args.conv3d
    H, W = args.size
    dt = jnp.dtype(args.dtype)
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, args.depth)
    Ws = [
        (jax.random.normal(k, (3, 3, 3, C, C)) * (0.3 / C)).astype(dt)
        for k in ks
    ]
    x0 = jax.random.uniform(key, (D, H, W, C)).astype(dt)
    print(
        f"device: {jax.devices()[0]}  conv3d {D}x{H}x{W} C={C} "
        f"depth={args.depth} {dt}",
        flush=True,
    )

    def conv_xla(x, w):
        return lax.conv_general_dilated(
            x[None], w, (1, 1, 1), "SAME",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
        )[0]

    def conv_shifts(x, w):
        xp = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0)))
        out = None
        for dz in range(3):
            for dy in range(3):
                for dx in range(3):
                    part = jnp.dot(
                        xp[dz : dz + D, dy : dy + H, dx : dx + W],
                        w[dz, dy, dx],
                        preferred_element_type=x.dtype,
                    )
                    out = part if out is None else out + part
        return out

    def conv_im2col(x, w):
        xp = jnp.pad(x, ((1, 1), (1, 1), (1, 1), (0, 0)))
        cols = jnp.concatenate(
            [
                xp[dz : dz + D, dy : dy + H, dx : dx + W]
                for dz in range(3)
                for dy in range(3)
                for dx in range(3)
            ],
            axis=-1,
        )
        return jnp.dot(cols, w.reshape(27 * C, C), preferred_element_type=x.dtype)

    def relu_bn(x):
        return jnp.maximum(x - x.mean(axis=(0, 1, 2)), 0.0)

    def chain(conv):
        def f(x):
            for w in Ws:
                x = relu_bn(conv(x, w))
            return x

        return jax.jit(f)

    variants = {
        "xla": chain(conv_xla),
        "shifts": chain(conv_shifts),
        "im2col": chain(conv_im2col),
    }
    ref = np.asarray(variants["xla"](x0), np.float32)
    for name, f in variants.items():
        got = np.asarray(f(x0), np.float32)
        err = np.abs(got - ref).max()
        assert err < (0.1 if dt == jnp.bfloat16 else 1e-3), (name, err)
    for name, f in variants.items():
        ms = chain_time(f, x0, iters=8)
        print(
            f"  {name:8s} {ms:8.2f} ms chain   {ms / args.depth:6.2f} ms/conv",
            flush=True,
        )


if __name__ == "__main__":
    main()
