"""Probe which Mosaic primitives work on this toolchain, one pallas_call each.

Each probe is independent: a failure prints the exception class + first line
and moves on.  Establishes the building blocks available for fused conv
kernels (strided convs, upsampling, parity splits) the way
microbench_pallas_gather.py established the gather situation.

Usage: python tools/probe_mosaic_ops.py [--probe NAME ...]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _run(name, fn):
    try:
        out = fn()
        jax.block_until_ready(out)
        # force a host read (block_until_ready is dispatch-only here)
        _ = np.asarray(jax.tree_util.tree_leaves(out)[0])[..., :1]
        print(f"[ok]   {name}")
        return True
    except Exception as e:
        first = str(e).splitlines()[0][:160] if str(e) else type(e).__name__
        print(f"[FAIL] {name}: {type(e).__name__}: {first}")
        return False


C, H, W = 8, 64, 256


def probe_sublane_stride2():
    """lax.slice stride 2 on the sublane (H) dim only."""

    def k(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jax.lax.slice(x, (0, 0, 0), (C, H, W), (1, 2, 1))

    x = jnp.arange(C * H * W, dtype=jnp.float32).reshape(C, H, W)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((C, H // 2, W), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    want = x[:, ::2, :]
    assert jnp.abs(out - want).max() == 0
    return out


def probe_lane_stride2():
    """lax.slice stride 2 on the lane (W) dim only."""

    def k(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jax.lax.slice(x, (0, 0, 0), (C, H, W), (1, 1, 2))

    x = jnp.arange(C * H * W, dtype=jnp.float32).reshape(C, H, W)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((C, H, W // 2), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    want = x[:, :, ::2]
    assert jnp.abs(out - want).max() == 0
    return out


def probe_lane_downsample_matmul():
    """W-downsample via (W, W/2) 0/1 selection matmul per channel (MXU)."""

    def k(x_ref, s_ref, o_ref):
        s = s_ref[...]
        for c in range(C):
            o_ref[c] = jnp.dot(
                x_ref[c], s, preferred_element_type=jnp.float32
            )

    x = jax.random.normal(jax.random.PRNGKey(0), (C, H, W), jnp.float32)
    sel = jnp.zeros((W, W // 2), jnp.float32).at[
        jnp.arange(0, W, 2), jnp.arange(W // 2)
    ].set(1.0)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((C, H, W // 2), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, sel)
    want = x[:, :, ::2]
    err = jnp.abs(out - want).max()
    print(f"    lane_downsample err={err:.2e}")
    assert err < 5e-2
    return out


def probe_sublane_downsample_matmul():
    """H-downsample via (H/2, H) selection matmul per channel (MXU)."""

    def k(x_ref, s_ref, o_ref):
        s = s_ref[...]
        for c in range(C):
            o_ref[c] = jnp.dot(
                s, x_ref[c], preferred_element_type=jnp.float32
            )

    x = jax.random.normal(jax.random.PRNGKey(0), (C, H, W), jnp.float32)
    sel = jnp.zeros((H // 2, H), jnp.float32).at[
        jnp.arange(H // 2), jnp.arange(0, H, 2)
    ].set(1.0)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((C, H // 2, W), x.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, sel)
    want = x[:, ::2, :]
    err = jnp.abs(out - want).max()
    print(f"    sublane_downsample err={err:.2e}")
    assert err < 5e-2
    return out


def probe_repeat_upsample():
    """2x nearest upsample via jnp.repeat on sublane+lane dims."""

    def k(x_ref, o_ref):
        x = x_ref[...]
        o_ref[...] = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)

    x = jax.random.normal(jax.random.PRNGKey(0), (C, H, W), jnp.float32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((C, 2 * H, 2 * W), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    want = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    assert jnp.abs(out - want).max() == 0
    return out


def probe_upsample_matmul():
    """2x nearest upsample via (H, 2H)/(W... ) 0/1 matmuls per channel."""

    def k(x_ref, sh_ref, sw_ref, o_ref):
        sh = sh_ref[...]
        sw = sw_ref[...]
        for c in range(C):
            o_ref[c] = jnp.dot(
                sh,
                jnp.dot(x_ref[c], sw, preferred_element_type=jnp.float32),
                preferred_element_type=jnp.float32,
            )

    x = jax.random.normal(jax.random.PRNGKey(0), (C, H, W), jnp.float32)
    sh = jnp.zeros((2 * H, H), jnp.float32).at[
        jnp.arange(2 * H), jnp.arange(2 * H) // 2
    ].set(1.0)
    sw = jnp.zeros((W, 2 * W), jnp.float32).at[
        jnp.arange(2 * W) // 2, jnp.arange(2 * W)
    ].set(1.0)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((C, 2 * H, 2 * W), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 3,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, sh, sw)
    want = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    err = jnp.abs(out - want).max()
    print(f"    upsample_matmul err={err:.2e}")
    assert err < 5e-2
    return out


def probe_grouped_conv3():
    """Grouped conv body: per (co, tap) multiply + channel-axis sum."""

    def k(x_ref, w_ref, o_ref):
        x = x_ref[...].astype(jnp.float32)
        w = w_ref[...]
        outs = []
        for co in range(C):
            acc = None
            for t, (ky, kx) in enumerate(
                (a, b) for a in range(3) for b in range(3)
            ):
                tap = x[:, ky : ky + H, kx : kx + W]
                term = jnp.sum(tap * w[co, t][:, :, None], axis=0)
                acc = term if acc is None else acc + term
            outs.append(acc)
        o_ref[...] = jnp.stack(outs)

    x = jax.random.normal(jax.random.PRNGKey(0), (C, H + 2, W + 2), jnp.float32)
    w = jax.random.normal(jax.random.PRNGKey(1), (C, 9, C, 1), jnp.float32) * 0.2
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((C, H, W), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x, w)
    # reference
    xn = x[:, 1:-1, 1:-1].transpose(1, 2, 0)[None]
    wn = w[..., 0].reshape(C, 3, 3, C).transpose(1, 2, 3, 0)
    want = jax.lax.conv_general_dilated(
        xn, wn, (1, 1), [(1, 1), (1, 1)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        precision=jax.lax.Precision.HIGHEST,
    )[0].transpose(2, 0, 1)
    err = jnp.abs(out - want).max()
    print(f"    grouped_conv3 err={err:.2e} (|want| max {jnp.abs(want).max():.2f})")
    assert err < 1e-3
    return out


def probe_dyn_row_mask():
    """broadcasted_iota + program_id-offset row mask + multi-res outputs."""

    def k(x_ref, o1_ref, o2_ref):
        i = pl.program_id(0)
        x = x_ref[...]
        rows = jax.lax.broadcasted_iota(jnp.int32, (1, H // 2, 1), 1)
        g = rows + i * (H // 2)
        o1_ref[...] = jnp.where(g < H - 5, x, 0.0)
        o2_ref[...] = jax.lax.slice(x, (0, 0, 0), (C, H // 2, W), (1, 1, 1))[
            :, : H // 4, : W // 2
        ]

    x = jax.random.normal(jax.random.PRNGKey(0), (C, H, W), jnp.float32)
    out = pl.pallas_call(
        k,
        grid=(2,),
        out_shape=(
            jax.ShapeDtypeStruct((C, H, W), x.dtype),
            jax.ShapeDtypeStruct((C, H // 2, W // 2), x.dtype),
        ),
        in_specs=[
            pl.BlockSpec((C, H // 2, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
        ],
        out_specs=(
            pl.BlockSpec((C, H // 2, W), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((C, H // 4, W // 2), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM),
        ),
    )(x)
    rows = jnp.arange(H)[None, :, None]
    want = jnp.where(rows < H - 5, x, 0.0)
    assert jnp.abs(out[0] - want).max() == 0
    return out


def probe_pad_value():
    """jnp.pad on a value inside the kernel."""

    def k(x_ref, o_ref):
        o_ref[...] = jnp.pad(x_ref[...], ((0, 0), (1, 1), (1, 1)))

    x = jax.random.normal(jax.random.PRNGKey(0), (C, H, W), jnp.float32)
    out = pl.pallas_call(
        k,
        out_shape=jax.ShapeDtypeStruct((C, H + 2, W + 2), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(x)
    want = jnp.pad(x, ((0, 0), (1, 1), (1, 1)))
    assert jnp.abs(out - want).max() == 0
    return out


PROBES = {
    "sublane_stride2": probe_sublane_stride2,
    "lane_stride2": probe_lane_stride2,
    "lane_downsample_matmul": probe_lane_downsample_matmul,
    "sublane_downsample_matmul": probe_sublane_downsample_matmul,
    "repeat_upsample": probe_repeat_upsample,
    "upsample_matmul": probe_upsample_matmul,
    "grouped_conv3": probe_grouped_conv3,
    "dyn_row_mask": probe_dyn_row_mask,
    "pad_value": probe_pad_value,
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--probe", nargs="*", default=list(PROBES))
    ap.add_argument("--interpret", action="store_true")
    args = ap.parse_args()
    ok = 0
    for name in args.probe:
        ok += _run(name, PROBES[name])
    print(f"{ok}/{len(args.probe)} probes ok")


if __name__ == "__main__":
    main()
