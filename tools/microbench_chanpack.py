"""Channel-packing A/B for the small-C convs that dominate the fused frame.

The open question after round 3's conv work: the 2D C=8 convs run ~0.4-0.6
TF/s in-graph and the 3D C=8 convs ~0.8-1.0 TF/s.  Whether that is the
chip's effective peak (nothing to gain) or lane under-utilization (up to
~16x headroom) decides if channel-packing rewrites can win.  Probes:

  peak    chained square matmuls (512/1024/2048) -> effective MXU TF/s
  fpn     the FPN's N=3 (views) C8 conv chain vs the same work packed as
          N=1 C24 with a block-diagonal kernel, and as a grouped conv
  dfold1  stage-1 U-Net 3^3 conv at (8,256,320) C8 vs the D axis folded
          into channels: a 2D 3x3 conv at (256,320) C64 whose dense kernel
          is the banded expansion of the 3D kernel (27 taps -> 9; D-taps
          collapse into the channel dim).  FLOPs x2.67, lanes 8 -> 64.
  dfold0  stage-0 3^3 conv at (64,64,80) C8 vs D folded by 8: 3D conv at
          (8,64,80) C64 with block-banded kernel.  FLOPs x8, lanes 8 -> 64.

Every variant is numerically identical to its XLA baseline (asserted).
Usage: python tools/microbench_chanpack.py [--which peak fpn dfold1 dfold0]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from microbench import chain_time  # noqa: E402


def bench_peak():
    import jax
    import jax.numpy as jnp

    print("== effective matmul peak (bf16, chained) ==", flush=True)
    for n in (512, 1024, 2048):
        key = jax.random.PRNGKey(0)
        a = jax.random.normal(key, (n, n)).astype(jnp.bfloat16)
        b = jax.random.normal(key, (n, n)).astype(jnp.bfloat16)

        def f(a, b=b):
            x = a
            for _ in range(8):
                x = jnp.dot(x, b, preferred_element_type=jnp.bfloat16)
            return x

        ms = chain_time(jax.jit(f), a, iters=8) / 8.0  # per matmul
        tf = 2 * n**3 / (ms * 1e-3) / 1e12
        print(f"  {n:5d}^3  {ms:7.3f} ms/matmul  {tf:6.2f} TF/s", flush=True)


def bench_fpn(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    C, V = 8, 3
    H, W = 512, 640
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, args.depth)
    Ws = [
        (jax.random.normal(k, (3, 3, C, C)) * (0.5 / C)).astype(dt) for k in ks
    ]
    x0 = jax.random.uniform(key, (V, H, W, C)).astype(dt)
    print(f"== fpn view-pack: V={V} C={C} {H}x{W} depth={args.depth} ==",
          flush=True)

    def chain_batched(x):  # today's form: conv over N=V batch
        for w in Ws:
            x = lax.conv_general_dilated(
                x, w, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            x = jnp.maximum(x - x.mean(axis=(1, 2), keepdims=True), 0.0)
        return x

    def blockdiag(w):  # (3,3,C,C) -> (3,3,VC,VC) with per-view blocks
        z = jnp.zeros((3, 3, V * C, V * C), w.dtype)
        for v in range(V):
            z = z.at[:, :, v * C:(v + 1) * C, v * C:(v + 1) * C].set(w)
        return z

    def chain_packed(xp):  # (1,H,W,VC)
        for w in Ws:
            xp = lax.conv_general_dilated(
                xp, blockdiag(w), (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            xp = _relu_center_packed(xp)
        return xp

    def _relu_center_packed(xp):
        # per-view, per-channel centering to match the batched chain
        m = xp.reshape(1, H, W, V, C).mean(axis=(1, 2))
        return jnp.maximum(xp - m.reshape(1, 1, 1, V * C), 0.0)

    def chain_grouped(xp):
        for w in Ws:
            wk = jnp.tile(w, (1, 1, 1, V))  # (3,3,C, V*C) groups share weights
            xp = lax.conv_general_dilated(
                xp, wk, (1, 1), "SAME", feature_group_count=V,
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            xp = _relu_center_packed(xp)
        return xp

    xp0 = jnp.transpose(x0, (1, 2, 0, 3)).reshape(1, H, W, V * C)
    ref = np.asarray(
        jax.jit(chain_batched)(x0), np.float32
    ).transpose(1, 2, 0, 3).reshape(H, W, V * C)
    for name, f, inp in (
        ("packed-bd", chain_packed, xp0),
        ("grouped", chain_grouped, xp0),
    ):
        got = np.asarray(jax.jit(f)(inp), np.float32)[0]
        err = np.abs(got - ref).max()
        assert err < 0.1, (name, err)

    for name, f, inp in (
        ("batched N=3", chain_batched, x0),
        ("packed-bd", chain_packed, xp0),
        ("grouped", chain_grouped, xp0),
    ):
        ms = chain_time(jax.jit(f), inp, iters=8)
        print(f"  {name:12s} {ms:8.2f} ms chain  {ms/args.depth:6.2f} ms/conv",
              flush=True)


def _fold_kernel_2d(w, D):
    """Shared builder — see gdb_nerf_tpu/ops/dfold.py (differential-tested)."""
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    from gdb_nerf_tpu.ops.dfold import fold_kernel

    return fold_kernel(w, D)


def _fold_kernel_3d(w, k):
    """(3,3,3,C,C) -> (3,3,3,kC,kC) block-banded kernel over D' = D/k blocks.

    Folded layout d-major within a block: channel = (d % k)*C + c.  Output
    scalar (b_o, r_o) needs input rows r_o-1..r_o+1; row r = b*k + j lives
    in block b at offset j.  For block-tap kb in {-1,0,1} (kernel index
    kb+1), input block b_i = b_o + kb contributes its row j_i whenever
    j_i + k*kb - j_o in {-1,0,1}, with 3D-kernel tap kd = (j_i + k*kb) -
    j_o + 1.
    """
    import jax.numpy as jnp

    C = w.shape[-2]
    z = jnp.zeros((3, 3, 3, k * C, k * C), w.dtype)
    for kb in (-1, 0, 1):
        for jo in range(k):
            for ji in range(k):
                kd = ji + k * kb - jo + 1
                if 0 <= kd < 3:
                    z = z.at[
                        kb + 1, :, :,
                        ji * C:(ji + 1) * C, jo * C:(jo + 1) * C,
                    ].set(w[kd])
    return z


def bench_dfold1(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    C, D, H, W = 8, 8, 256, 320
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, args.depth)
    Ws = [
        (jax.random.normal(k, (3, 3, 3, C, C)) * (0.3 / C)).astype(dt)
        for k in ks
    ]
    x0 = jax.random.uniform(key, (1, D, H, W, C)).astype(dt)
    print(f"== dfold1: 3^3 C{C} @({D},{H},{W}) vs 2D C{D*C} @({H},{W}) "
          f"depth={args.depth} ==", flush=True)

    def chain_3d(x):
        for w in Ws:
            x = lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            x = jnp.maximum(x - x.mean(axis=(1, 2, 3), keepdims=True), 0.0)
        return x

    W2s = [_fold_kernel_2d(w, D) for w in Ws]

    def chain_folded(xf):  # (1,H,W,DC)
        for w2 in W2s:
            xf = lax.conv_general_dilated(
                xf, w2, (1, 1), "SAME",
                dimension_numbers=("NHWC", "HWIO", "NHWC"))
            m = xf.reshape(1, H, W, D, C).mean(axis=(1, 2))
            xf = jnp.maximum(xf - m.reshape(1, 1, 1, D * C), 0.0)
        return xf

    xf0 = jnp.transpose(x0[0], (1, 2, 0, 3)).reshape(1, H, W, D * C)
    ref = np.asarray(jax.jit(chain_3d)(x0), np.float32)[0]
    got = np.asarray(jax.jit(chain_folded)(xf0), np.float32)[0]
    got = got.reshape(H, W, D, C).transpose(2, 0, 1, 3)
    err = np.abs(got - ref).max()
    assert err < 0.35, err  # bf16 reduction-order noise grows with K

    for name, f, inp in (("3d xla", chain_3d, x0),
                         ("folded 2d", chain_folded, xf0)):
        ms = chain_time(jax.jit(f), inp, iters=8)
        print(f"  {name:10s} {ms:8.2f} ms chain  {ms/args.depth:6.2f} ms/conv",
              flush=True)


def bench_dfold0(args):
    import jax
    import jax.numpy as jnp
    from jax import lax

    C, D, H, W, k = 8, 64, 64, 80, 8
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, args.depth)
    Ws = [
        (jax.random.normal(kk, (3, 3, 3, C, C)) * (0.3 / C)).astype(dt)
        for kk in ks
    ]
    x0 = jax.random.uniform(key, (1, D, H, W, C)).astype(dt)
    print(f"== dfold0: 3^3 C{C} @({D},{H},{W}) vs 3^3 C{k*C} "
          f"@({D//k},{H},{W}) depth={args.depth} ==", flush=True)

    def chain_3d(x):
        for w in Ws:
            x = lax.conv_general_dilated(
                x, w, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            x = jnp.maximum(x - x.mean(axis=(1, 2, 3), keepdims=True), 0.0)
        return x

    W3s = [_fold_kernel_3d(w, k) for w in Ws]

    def chain_folded(xf):  # (1,D/k,H,W,kC)
        for w3 in W3s:
            xf = lax.conv_general_dilated(
                xf, w3, (1, 1, 1), "SAME",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"))
            m = xf.reshape(1, D // k, H, W, k, C).mean(axis=(1, 2, 3))
            xf = jnp.maximum(xf - m.reshape(1, 1, 1, 1, k * C), 0.0)
        return xf

    xf0 = x0[0].reshape(D // k, k, H, W, C).transpose(0, 2, 3, 1, 4).reshape(
        1, D // k, H, W, k * C)
    ref = np.asarray(jax.jit(chain_3d)(x0), np.float32)[0]
    got = np.asarray(jax.jit(chain_folded)(xf0), np.float32)[0]
    got = got.reshape(D // k, H, W, k, C).transpose(0, 3, 1, 2, 4).reshape(
        D, H, W, C)
    err = np.abs(got - ref).max()
    assert err < 0.35, err  # bf16 reduction-order noise grows with K

    for name, f, inp in (("3d xla", chain_3d, x0),
                         ("folded 3d", chain_folded, xf0)):
        ms = chain_time(jax.jit(f), inp, iters=8)
        print(f"  {name:10s} {ms:8.2f} ms chain  {ms/args.depth:6.2f} ms/conv",
              flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--which", nargs="*",
                    default=["peak", "fpn", "dfold1", "dfold0"])
    ap.add_argument("--depth", type=int, default=6)
    args = ap.parse_args()

    import jax

    print(f"device: {jax.devices()[0]}", flush=True)
    for which in args.which:
        {"peak": lambda: bench_peak(),
         "fpn": lambda: bench_fpn(args),
         "dfold1": lambda: bench_dfold1(args),
         "dfold0": lambda: bench_dfold0(args)}[which]()


if __name__ == "__main__":
    main()
