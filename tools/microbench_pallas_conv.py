"""Pallas plane-layout conv kernels: can fused VMEM conv chains beat XLA?

Context (PERF.md round 3): the fused 512x640 frame is conv/structure-bound
(~46 ms non-encode).  Per-conv XLA is already near the HBM floor (~0.94 ms
for a C8 3x3 at 512x640 vs a ~0.66 ms read+write floor), so the remaining
conv win is NOT a better single conv — it is keeping intermediates in VMEM
across a *chain* of convs.  XLA cannot do that (each conv materializes to
HBM); a Pallas kernel holding the whole chain in VMEM can.

Layout: planes (C, H, W) — lanes carry W (640 = 5x128 tiles), sublanes H.
With C=8 in NHWC the lane dim would be 8/128 = 94% waste; in plane layout
the conv becomes 9*C_in*C_out shifted plane-FMAs on fully-occupied vregs,
with scalar weights from SMEM.

Usage:
  python tools/microbench_pallas_conv.py --check     # CPU interpret-mode numerics
  python tools/microbench_pallas_conv.py             # TPU timing A/B
"""

from __future__ import annotations

import argparse
import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if "--check" in sys.argv:
    # sitecustomize force-selects the TPU plugin; env vars alone cannot
    # redirect (see tests/conftest.py) — override via jax.config before any
    # backend initializes.
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _conv_body(x_pad, w_ref, c_in, c_out, H, W, base):
    """Sum of 9*c_in shifted plane-FMAs; returns (c_out, H, W) f32 value.

    x_pad: (c_in, H+2, W+2) f32 value (already padded).
    w_ref: SMEM ref, flat weights; tap (co, ci, ky, kx) at
      base + ((co*c_in + ci)*3 + ky)*3 + kx.
    """
    taps = [
        [x_pad[:, ky : ky + H, kx : kx + W] for kx in range(3)]
        for ky in range(3)
    ]
    outs = []
    for co in range(c_out):
        acc = None
        for ci in range(c_in):
            for ky in range(3):
                for kx in range(3):
                    w = w_ref[base + ((co * c_in + ci) * 3 + ky) * 3 + kx]
                    term = taps[ky][kx][ci] * w
                    acc = term if acc is None else acc + term
        outs.append(acc)
    return jnp.stack(outs, axis=0)


def conv1_kernel(x_ref, w_ref, b_ref, o_ref, *, c_in, c_out, H, W):
    """One 3x3 conv + bias + ReLU.  x_ref: (c_in, H+2, W+2); o_ref: (c_out, H, W)."""
    x = x_ref[...].astype(jnp.float32)
    y = _conv_body(x, w_ref, c_in, c_out, H, W, 0)
    for co in range(c_out):
        o_ref[co] = jnp.maximum(y[co] + b_ref[co], 0.0).astype(o_ref.dtype)


def convchain_kernel(x_ref, w_ref, b_ref, o_ref, s_ref, *, c, H, W, n_conv):
    """n_conv chained 3x3 convs (+bias+ReLU), intermediates in VMEM scratch.

    x_ref: (c, H+2, W+2); s_ref scratch: (c, H+2, W+2); o_ref: (c, H, W).
    Weight tap base for conv k: k*c*c*9; bias base: k*c.
    """
    nw = c * c * 9
    if n_conv > 1:
        s_ref[...] = jnp.zeros_like(s_ref)  # zero the padding ring once
    for k in range(n_conv):
        src = x_ref if k == 0 else s_ref
        x = src[...].astype(jnp.float32)
        y = _conv_body(x, w_ref, c, c, H, W, k * nw)
        last = k == n_conv - 1
        for co in range(c):
            v = jnp.maximum(y[co] + b_ref[k * c + co], 0.0)
            if last:
                o_ref[co] = v.astype(o_ref.dtype)
            else:
                # zero-padded borders stay zero: write interior only
                s_ref[co, 1 : H + 1, 1 : W + 1] = v.astype(s_ref.dtype)


def _conv_grouped(x_pad, w_val, H, W, stride=1, ksize=3):
    """Grouped formulation: per (co, tap) one multiply + channel-sum.

    x_pad: (c_in, H_pad, W_pad) f32 value; w_val: (c_out, k*k, c_in, 1) f32
    value (whole conv's weights loaded once).  Returns (c_out, H_out, W_out).
    MLIR op count scales with c_out*k*k, not c_out*c_in*k*k.
    """
    c_out = w_val.shape[0]
    outs = []
    for co in range(c_out):
        acc = None
        t = 0
        for ky in range(ksize):
            for kx in range(ksize):
                if stride == 1:
                    tap = x_pad[:, ky : ky + H, kx : kx + W]
                else:
                    # python strided slicing lowers through gather (>2D
                    # unsupported in Mosaic); lax.slice carries strides
                    # natively.
                    tap = jax.lax.slice(
                        x_pad,
                        (0, ky, kx),
                        (x_pad.shape[0], ky + H, kx + W),
                        (1, stride, stride),
                    )
                w = w_val[co, t][:, :, None]  # (c_in, 1, 1)
                term = jnp.sum(tap * w, axis=0)
                acc = term if acc is None else acc + term
                t += 1
        outs.append(acc)
    return jnp.stack(outs, axis=0)


def fpnprim_kernel(x_ref, w_ref, b_ref, o1_ref, o2_ref, *, c, H, W):
    """Primitive soup for the fused-FPN kernel, in one Mosaic compile:

      o1 = conv5x5 stride-2 (grouped formulation, strided lane+sublane slices)
      o2 = 2x nearest-upsample of o1 + dynamic row masking via iota
    """
    x = x_ref[...].astype(jnp.float32)
    w = w_ref[...].astype(jnp.float32)  # (c, 25, c, 1)
    y = _conv_grouped(x, w, H, W, stride=2, ksize=5)  # (c, H/2, W/2)
    y = y + jnp.stack([jnp.full((H // 2, W // 2), b_ref[co]) for co in range(c)])
    for co in range(c):
        o1_ref[co] = y[co].astype(o1_ref.dtype)
    # upsample 2x both dims (nearest): repeat rows and cols
    up = jnp.repeat(jnp.repeat(y, 2, axis=1), 2, axis=2)  # (c, H, W)
    # dynamic row mask: zero rows >= H-3 (stand-in for slab validity masking)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, H, 1), 1)
    up = jnp.where(rows < H - 3, up, 0.0)
    for co in range(c):
        o2_ref[co] = up[co].astype(o2_ref.dtype)


def pallas_fpnprim(x, w, b, interpret=False):
    """x: (c, H+4, W+4) padded planes; w: (c, c, 5, 5); b: (c,)."""
    c = w.shape[0]
    H, W = x.shape[1] - 4, x.shape[2] - 4
    kern = functools.partial(fpnprim_kernel, c=c, H=H, W=W)
    # weights pre-arranged (c_out, taps, c_in, 1) for whole-block VMEM loads
    w_arr = w.transpose(0, 2, 3, 1).reshape(c, 25, c, 1)
    return pl.pallas_call(
        kern,
        out_shape=(
            jax.ShapeDtypeStruct((c, H // 2, W // 2), x.dtype),
            jax.ShapeDtypeStruct((c, H, W), x.dtype),
        ),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ),
        interpret=interpret,
    )(x, w_arr.astype(jnp.float32), b.astype(jnp.float32))


def check_prims(dtype=jnp.float32):
    c, H, W = 8, 64, 256
    x = jax.random.normal(jax.random.PRNGKey(0), (c, H, W), dtype)
    w = (jax.random.normal(jax.random.PRNGKey(1), (c, c, 5, 5)) * 0.1).astype(dtype)
    b = jax.random.normal(jax.random.PRNGKey(2), (c,)).astype(dtype)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2)))
    got1, got2 = pallas_fpnprim(xp, w, b, interpret=True)

    x_nhwc = x.transpose(1, 2, 0)[None]
    w_hwio = w.transpose(2, 3, 1, 0)
    y = jax.lax.conv_general_dilated(
        x_nhwc, w_hwio, (2, 2), [(2, 2), (2, 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )[0] + b
    want1 = y.transpose(2, 0, 1)
    err1 = jnp.abs(got1 - want1).max()
    up = jnp.repeat(jnp.repeat(want1, 2, axis=1), 2, axis=2)
    rows = jnp.arange(H)[None, :, None]
    want2 = jnp.where(rows < H - 3, up, 0.0)
    err2 = jnp.abs(got2 - want2).max()
    print(f"fpnprim conv5s2 max|err| = {err1:.2e}, upsample+mask = {err2:.2e}")
    assert err1 < 1e-4 and err2 < 1e-4, (err1, err2)
    print("prims numerics OK")


def bench_prims():
    from tools.microbench import chain_time

    c, H, W = 8, 512, 640
    dtype = jnp.bfloat16
    x = jax.random.normal(jax.random.PRNGKey(0), (c, H, W), dtype)
    xp = jnp.pad(x, ((0, 0), (2, 2), (2, 2)))
    w = (jax.random.normal(jax.random.PRNGKey(1), (c, c, 5, 5)) * 0.1).astype(dtype)
    b = jax.random.normal(jax.random.PRNGKey(2), (c,)).astype(dtype)
    t = chain_time(lambda xp: pallas_fpnprim(xp, w, b)[0], xp, iters=20)
    print(f"fpnprim conv5s2+up @ {H}x{W} C{c}: {t*1000:.2f} ms")


def pallas_conv1(x, w, b, interpret=False):
    """x: (c_in, H+2, W+2) padded planes; w: (c_out, c_in, 3, 3); b: (c_out,)."""
    c_out, c_in = w.shape[:2]
    H, W = x.shape[1] - 2, x.shape[2] - 2
    kern = functools.partial(conv1_kernel, c_in=c_in, c_out=c_out, H=H, W=W)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((c_out, H, W), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=interpret,
    )(x, w.reshape(-1).astype(jnp.float32), b.astype(jnp.float32))


def pallas_convchain(x, ws, bs, interpret=False):
    """x: (c, H+2, W+2); ws: (n, c, c, 3, 3); bs: (n, c)."""
    n, c = ws.shape[:2]
    H, W = x.shape[1] - 2, x.shape[2] - 2
    kern = functools.partial(convchain_kernel, c=c, H=H, W=W, n_conv=n)
    return pl.pallas_call(
        kern,
        out_shape=jax.ShapeDtypeStruct((c, H, W), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((c, H + 2, W + 2), x.dtype)],
        interpret=interpret,
    )(x, ws.reshape(-1).astype(jnp.float32), bs.reshape(-1).astype(jnp.float32))


def xla_conv_nhwc(x, w, b):
    """Reference: NHWC lax conv + bias + relu.  x: (1, H, W, c_in)."""
    y = jax.lax.conv_general_dilated(
        x, w, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return jax.nn.relu(y + b)


def check(dtype=jnp.float32):
    k = jax.random.PRNGKey(0)
    c, H, W = 8, 32, 256
    x = jax.random.normal(k, (c, H, W), dtype)
    w = (jax.random.normal(jax.random.PRNGKey(1), (c, c, 3, 3)) * 0.2).astype(dtype)
    b = jax.random.normal(jax.random.PRNGKey(2), (c,)).astype(dtype)

    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    got = pallas_conv1(xp, w, b, interpret=True)
    # reference in NHWC
    x_nhwc = x.transpose(1, 2, 0)[None]
    w_hwio = w.transpose(2, 3, 1, 0)  # (co,ci,ky,kx) -> (ky,kx,ci,co)
    want = xla_conv_nhwc(x_nhwc, w_hwio, b)[0].transpose(2, 0, 1)
    err = jnp.abs(got - want).max()
    print(f"conv1 max|err| = {err:.2e}")
    assert err < 1e-4, err

    n = 3
    ws = (jax.random.normal(jax.random.PRNGKey(3), (n, c, c, 3, 3)) * 0.2).astype(dtype)
    bs = (jax.random.normal(jax.random.PRNGKey(4), (n, c)) * 0.1).astype(dtype)
    got = pallas_convchain(xp, ws, bs, interpret=True)
    cur = x_nhwc
    for i in range(n):
        cur = xla_conv_nhwc(cur, ws[i].transpose(2, 3, 1, 0), bs[i])
    want = cur[0].transpose(2, 0, 1)
    err = jnp.abs(got - want).max()
    print(f"convchain({n}) max|err| = {err:.2e}")
    assert err < 1e-4, err
    print("numerics OK")


def bench():
    from gdb_nerf_tpu.ops.loops import unrolled_vmap  # noqa: F401  (repo import path)
    from tools.microbench import chain_time

    c, H, W = 8, 512, 640
    n = 4
    dtype = jnp.bfloat16
    k = jax.random.PRNGKey(0)
    x = jax.random.normal(k, (c, H, W), dtype)
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    ws = (jax.random.normal(jax.random.PRNGKey(3), (n, c, c, 3, 3)) * 0.2).astype(dtype)
    bs = (jax.random.normal(jax.random.PRNGKey(4), (n, c)) * 0.1).astype(dtype)

    # Pallas chain: n convs in ONE kernel, intermediates in VMEM.
    def pallas_fn(xp):
        return pallas_convchain(xp, ws, bs)

    # XLA chain: n convs, each materializing to HBM (+fused bias/relu).
    x_nhwc = x.transpose(1, 2, 0)[None]
    w_hwio = [ws[i].transpose(2, 3, 1, 0) for i in range(n)]

    def xla_fn(xn):
        cur = xn
        for i in range(n):
            cur = xla_conv_nhwc(cur, w_hwio[i], bs[i])
        return cur

    t_p = chain_time(pallas_fn, xp, iters=20)
    t_x = chain_time(xla_fn, x_nhwc, iters=20)
    per_p = t_p / n * 1000
    per_x = t_x / n * 1000
    print(f"chain of {n} C{c} 3x3 convs @ {H}x{W} ({dtype.__name__ if hasattr(dtype,'__name__') else dtype}):")
    print(f"  pallas (one kernel, VMEM chain): {t_p*1000:.2f} ms total, {per_p:.2f} ms/conv")
    print(f"  xla    (separate convs, fused):  {t_x*1000:.2f} ms total, {per_x:.2f} ms/conv")
    print(f"  speedup: {t_x/t_p:.2f}x")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--check", action="store_true")
    ap.add_argument("--prims", action="store_true")
    args = ap.parse_args()
    if args.check:
        check()
        check_prims()
    elif args.prims:
        bench_prims()
    else:
        bench()
