"""A/B microbench of cost-volume construction variants on the current device.

The per-stage profile attributes far more time to build_cost_volume than its
gather-row floor (stage1: 1.97 M rows ~= 8 ms at 250 M rows/s, measured
~33 ms).  The suspected overhead is materialization of the (V, D, H, W, 4C)
gathered-row tensor and the (V, D, H, W, C) warped tensor before the
variance reduction.  Variants:

  A) current: vmap over views -> (V, D, H, W, C) -> mean/mean-of-squares.
  B) unrolled accumulation: python loop over V accumulating sum / sum-of-
     squares in fp32 — never materializes the V axis, one fusion per view.
  C) unrolled, bf16 accumulation (numerics check only — accumulating the
     second moment in bf16 is expected to cost dB; measured for reference).

Usage: python tools/microbench_cv.py
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

    from gdb_nerf_tpu.ops import camera, cost_volume
    from gdb_nerf_tpu.ops.grid_sample import pack_bilinear_2d

    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)

    for name, (V, D, Ht, Wt, Hs, Ws, C, inv) in {
        "stage0 (D=64 @64x80, C=32)": (3, 64, 64, 80, 128, 160, 32, True),
        "stage1 (D=8 @256x320, C=16)": (3, 8, 256, 320, 256, 320, 16, False),
    }.items():
        feats = jax.random.normal(key, (V, Hs, Ws, C), jnp.bfloat16)
        K = np.array(
            [[2.0 * Ws, 0, Ws / 2], [0, 2.0 * Ws, Hs / 2], [0, 0, 1]], np.float32
        )
        exts = []
        for i in range(V + 1):
            e = np.eye(4, dtype=np.float32)
            e[0, 3] = -0.3 + 0.2 * i
            e[2, 3] = 4.0
            exts.append(e)
        src_exts = jnp.asarray(np.stack(exts[:V]))
        tar_ext = jnp.asarray(exts[-1])
        src_ints = jnp.stack([jnp.asarray(K)] * V)
        tar_int = jnp.asarray(K) * jnp.asarray([Wt / Ws, Wt / Ws, 1.0])[:, None]
        lo, hi = (1 / 6.0, 1 / 2.5) if inv else (2.5, 6.0)
        dv = jnp.broadcast_to(
            jnp.linspace(lo, hi, D, dtype=jnp.float32)[:, None, None], (D, Ht, Wt)
        )

        def variant_a(f):
            # The pre-fusion formulation: vmap over views, then moments over
            # the materialized (V, D, Ht, Wt, C) tensor.
            metric = 1.0 / dv if inv else dv
            projs = jax.vmap(
                lambda e, k: camera.plane_sweep_projection(e, k, tar_ext, tar_int)
            )(src_exts, src_ints)
            packed = pack_bilinear_2d(f)
            warped = jax.vmap(
                lambda fp, p: cost_volume.warp_src_to_volume(fp, p, metric)
            )(packed, projs)
            mean = jnp.mean(warped, axis=0, dtype=jnp.float32)
            sq = jnp.mean(jnp.square(warped.astype(jnp.float32)), axis=0)
            return (sq - jnp.square(mean)).astype(f.dtype)

        def variant_b(f):
            # The shipped unrolled-accumulation path.
            return cost_volume.build_cost_volume(
                f, src_exts, src_ints, tar_ext, tar_int, dv, inv
            )

        a = jax.jit(variant_a)(feats)
        b = jax.jit(variant_b)(feats)
        err = float(jnp.max(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32))))
        print(f"{name}: max |A-B| = {err:.3e}", flush=True)

        ms_a = chain_time(variant_a, feats, iters=8)
        ms_b = chain_time(variant_b, feats, iters=8)
        print(f"  A vmap+moments : {ms_a:8.2f} ms", flush=True)
        print(f"  B unrolled-acc : {ms_b:8.2f} ms", flush=True)


if __name__ == "__main__":
    main()
