"""Unrolled alternatives to jax.vmap for tiny static axes.

On this TPU toolchain, vmap over a small leading axis (views V in [2, 4],
batch B in [1, 4]) consistently compiles to WORSE code than an unrolled
python loop + stack: the batched intermediates block producer fusion, so
coordinate/interp chains round-trip HBM.  Measured wins from unrolling:
build_cost_volume 2-3x per stage (tools/microbench_cv.py), encode_samples
views 102.6 -> 85.3 ms/frame.  This module makes the pattern reusable.

No reference analog — the reference's per-batch python loop
(/root/reference/networks/gdb_nerf/bundle_sampler.py) does the same thing
for a different reason (ragged shapes).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp


def unrolled_vmap(fn, in_axes: Sequence[Any]):
    """vmap(fn, in_axes) semantics for axis-0 mapping, as an unrolled loop.

    Args:
      fn: function of N positional args returning a pytree.
      in_axes: per-arg, 0 (map over leading axis) or None (broadcast) —
        the only two cases the pipeline uses.

    Returns a wrapped fn that loops over the mapped axis in python (static
    trip count) and stacks the outputs along axis 0.
    """

    def wrapper(*args):
        assert len(args) == len(in_axes), (len(args), len(in_axes))
        n = None
        for k, (a, ax) in enumerate(zip(args, in_axes)):
            if ax == 0:
                for leaf in jax.tree_util.tree_leaves(a):
                    if n is None:
                        n = leaf.shape[0]
                    elif leaf.shape[0] != n:
                        raise ValueError(
                            f"unrolled_vmap: mapped arg {k} has leading dim "
                            f"{leaf.shape[0]}, expected {n}"
                        )
        assert n is not None, "no mapped argument"

        outs = []
        for i in range(n):
            sliced = [
                a if ax is None else jax.tree_util.tree_map(lambda t: t[i], a)
                for a, ax in zip(args, in_axes)
            ]
            outs.append(fn(*sliced))
        return jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *outs)

    return wrapper
