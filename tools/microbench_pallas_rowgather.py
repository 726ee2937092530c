"""The VERDICT-requested serious Pallas gather attempt: scalar-offset row
fetches with multi-buffered DMA, vs XLA's native gather.

Round-2 established (tools/microbench_pallas_gather.py) that vectorized
gathers (jnp.take / take_along_axis) do not lower in Mosaic on this
toolchain.  What remains expressible is SCALAR-driven row access:

  A. VMEM dynamic-slice loop — table resident in VMEM, one
     ``tab_ref[pl.ds(idx, 1), :]`` row copy per loop step.
  B. HBM per-row DMA ring — table stays in HBM (memory_space=ANY), indices
     scalar-prefetched to SMEM, a ring of 8 in-flight
     ``make_async_copy(tab.at[idx], scratch.at[slot])`` row DMAs
     (the 'double-buffered row fetch' pattern).

Both are measured against XLA's HBM gather (~250 M rows/s on this chip).
The encode stage needs ~5M rows/frame: to beat 33 ms budgets, a gather
path must sustain >150 M rows/s.  Scalar-issue rates (VPU loop or DMA
issue) top out orders of magnitude below that — this tool measures the
actual number so PERF.md can close the fused-gather-kernel question with
compiler evidence rather than assertion.

Usage: python tools/microbench_pallas_rowgather.py
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from microbench import chain_time  # noqa: E402


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    print(f"device: {jax.devices()[0]}", flush=True)
    key = jax.random.PRNGKey(0)

    ROWS, C = 8192, 128  # table: 2 MB bf16, VMEM-resident; C=128 = one lane row
    N = 262_144  # gather rows per call (scaled-down probe)
    TILE = 2048

    table = jax.random.normal(key, (ROWS, C), jnp.bfloat16)
    idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, ROWS, jnp.int32)

    # --- XLA baseline ---
    ms = chain_time(lambda t: jnp.take(t, idx, axis=0), table, iters=5)
    print(
        f"XLA take           : {ms:8.2f} ms  ({N / (ms / 1000) / 1e6:7.1f} M rows/s)",
        flush=True,
    )

    # --- A: VMEM dynamic-slice scalar loop ---
    def vmem_loop_kernel(idx_ref, tab_ref, out_ref):
        t = pl.program_id(0)

        def body(i, _):
            r = idx_ref[t * TILE + i]
            out_ref[pl.ds(i, 1), :] = tab_ref[pl.ds(r, 1), :]
            return 0

        jax.lax.fori_loop(0, TILE, body, 0)

    def pallas_vmem_loop(tab):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // TILE,),
            in_specs=[pl.BlockSpec((ROWS, C), lambda i, s: (0, 0))],
            out_specs=pl.BlockSpec((TILE, C), lambda i, s: (i, 0)),
        )
        return pl.pallas_call(
            vmem_loop_kernel,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
            grid_spec=grid_spec,
        )(idx, tab)

    try:
        out = pallas_vmem_loop(table)
        import numpy as np

        ref = np.asarray(jnp.take(table, idx, axis=0), np.float32)
        err = np.abs(np.asarray(out, np.float32) - ref).max()
        assert err == 0.0, f"mismatch {err}"
        ms = chain_time(pallas_vmem_loop, table, iters=3)
        print(
            f"pallas VMEM ds-loop: {ms:8.2f} ms  "
            f"({N / (ms / 1000) / 1e6:7.1f} M rows/s)",
            flush=True,
        )
    except Exception as e:
        print(
            f"pallas VMEM ds-loop FAILED: {type(e).__name__}: {str(e)[:300]}",
            flush=True,
        )

    # --- B: HBM per-row DMA ring (8 in flight) ---
    DEPTH = 8

    def dma_ring_kernel(idx_ref, tab_hbm, out_ref):
        t = pl.program_id(0)

        def body(scratch, sems):
            def get_dma(slot, j):
                return pltpu.make_async_copy(
                    tab_hbm.at[pl.ds(idx_ref[t * TILE + j], 1), :],
                    scratch.at[pl.ds(slot, 1), :],
                    sems.at[slot],
                )

            def warm(j, _):
                get_dma(j, j).start()
                return 0

            jax.lax.fori_loop(0, DEPTH, warm, 0)

            def body2(j, _):
                slot = jax.lax.rem(j, DEPTH)
                get_dma(slot, j).wait()
                out_ref[pl.ds(j, 1), :] = scratch[pl.ds(slot, 1), :]

                nxt = j + DEPTH

                @pl.when(nxt < TILE)
                def _():
                    get_dma(slot, nxt).start()

                return 0

            jax.lax.fori_loop(0, TILE, body2, 0)

        pl.run_scoped(
            body,
            scratch=pltpu.VMEM((DEPTH, C), jnp.bfloat16),
            sems=pltpu.SemaphoreType.DMA((DEPTH,)),
        )

    def pallas_dma_ring(tab):
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(N // TILE,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=pl.BlockSpec((TILE, C), lambda i, s: (i, 0)),
        )
        return pl.pallas_call(
            dma_ring_kernel,
            out_shape=jax.ShapeDtypeStruct((N, C), jnp.bfloat16),
            grid_spec=grid_spec,
        )(idx, tab)

    try:
        out = pallas_dma_ring(table)
        import numpy as np

        ref = np.asarray(jnp.take(table, idx, axis=0), np.float32)
        err = np.abs(np.asarray(out, np.float32) - ref).max()
        assert err == 0.0, f"mismatch {err}"
        ms = chain_time(pallas_dma_ring, table, iters=3)
        print(
            f"pallas HBM DMA ring: {ms:8.2f} ms  "
            f"({N / (ms / 1000) / 1e6:7.1f} M rows/s)",
            flush=True,
        )
    except Exception as e:
        print(
            f"pallas HBM DMA ring FAILED: {type(e).__name__}: {str(e)[:300]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
