"""Litmus test: can a Pallas kernel gather from a VMEM-resident table faster
than XLA's HBM gather (~250 M rows/s on this chip)?

Tries the idioms Mosaic might support for vectorized dynamic gathers:
  * jnp.take on a VMEM-loaded table (lax.gather lowering),
  * take_along_axis along the sublane axis,
  * one-hot matmul contraction (MXU) for a tiny table.

If none compile or none beat XLA, the fused-gather-kernel strategy is dead
and optimization must reduce passes/bytes instead.

Usage: python tools/microbench_pallas_gather.py
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from microbench import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)

    ROWS, C = 8192, 16  # table: 256 KB bf16 — comfortably VMEM-resident
    N = 1_048_576  # 1M gather rows
    TILE = 8192  # indices processed per grid step

    table = jax.random.normal(key, (ROWS, C), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N, 1), 0, ROWS, jnp.int32)

    # --- XLA baseline ---
    ms = chain_time(lambda t: jnp.take(t, idx, axis=0), table, iters=5)
    print(f"XLA take: {ms:8.2f} ms  ({N / (ms / 1000) / 1e6:.0f} M rows/s)",
          flush=True)

    # --- Pallas: jnp.take of a VMEM table per tile ---
    def take_kernel(idx_ref, tab_ref, out_ref):
        out_ref[:] = jnp.take(tab_ref[:], idx_ref[:, 0], axis=0)

    def pallas_take(tab):
        return pl.pallas_call(
            take_kernel,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        )(idx, tab)

    try:
        ms = chain_time(pallas_take, table, iters=5)
        print(f"pallas jnp.take: {ms:8.2f} ms  "
              f"({N / (ms / 1000) / 1e6:.0f} M rows/s)", flush=True)
    except Exception as e:
        print(f"pallas jnp.take FAILED: {type(e).__name__}: {str(e)[:200]}",
              flush=True)

    # --- Pallas: take_along_axis on sublane axis ---
    def taa_kernel(idx_ref, tab_ref, out_ref):
        ids = idx_ref[:]  # (TILE, 1)
        out_ref[:] = jnp.take_along_axis(
            tab_ref[:], jnp.broadcast_to(ids, (TILE, C)), axis=0
        )

    def pallas_taa(tab):
        return pl.pallas_call(
            taa_kernel,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
            grid=(N // TILE,),
            in_specs=[
                pl.BlockSpec((TILE, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
                pl.BlockSpec((ROWS, C), lambda i: (0, 0), memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec(
                (TILE, C), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        )(idx, tab)

    try:
        ms = chain_time(pallas_taa, table, iters=5)
        print(f"pallas take_along_axis: {ms:8.2f} ms  "
              f"({N / (ms / 1000) / 1e6:.0f} M rows/s)", flush=True)
    except Exception as e:
        print(f"pallas take_along_axis FAILED: {type(e).__name__}: "
              f"{str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
