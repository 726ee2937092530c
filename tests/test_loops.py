"""unrolled_vmap (ops/loops.py) semantics vs jax.vmap."""

import numpy as np

import jax
import jax.numpy as jnp

from gdb_nerf_tpu.ops.loops import unrolled_vmap


def test_matches_vmap_mixed_axes(rng):
    def fn(a, b, c):
        return a * 2.0 + b, {"s": jnp.sum(a) + c}

    a = jnp.array(rng.standard_normal((3, 4, 5)).astype(np.float32))
    b = jnp.array(rng.standard_normal((4, 5)).astype(np.float32))  # broadcast
    c = jnp.float32(1.5)

    got = unrolled_vmap(fn, (0, None, None))(a, b, c)
    want = jax.vmap(fn, in_axes=(0, None, None))(a, b, c)
    np.testing.assert_allclose(np.asarray(got[0]), np.asarray(want[0]), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(got[1]["s"]), np.asarray(want[1]["s"]), rtol=1e-6
    )


def test_pytree_args_and_outputs(rng):
    from typing import NamedTuple

    class Pair(NamedTuple):
        x: jax.Array
        y: jax.Array

    def fn(p):
        return Pair(p.x + p.y, p.x * p.y)

    p = Pair(
        jnp.array(rng.standard_normal((2, 3)).astype(np.float32)),
        jnp.array(rng.standard_normal((2, 3)).astype(np.float32)),
    )
    got = unrolled_vmap(fn, (0,))(p)
    want = jax.vmap(fn)(p)
    np.testing.assert_allclose(np.asarray(got.x), np.asarray(want.x))
    np.testing.assert_allclose(np.asarray(got.y), np.asarray(want.y))


def test_b1_roundtrip(rng):
    # The B=1 case (the whole eval batch) must still add the leading axis.
    x = jnp.array(rng.standard_normal((1, 7)).astype(np.float32))
    got = unrolled_vmap(lambda t: t * 3.0, (0,))(x)
    assert got.shape == (1, 7)
    np.testing.assert_allclose(np.asarray(got), np.asarray(x) * 3.0)


def test_works_under_jit(rng):
    x = jnp.array(rng.standard_normal((4, 8)).astype(np.float32))
    f = jax.jit(unrolled_vmap(lambda t: jnp.cumsum(t), (0,)))
    np.testing.assert_allclose(
        np.asarray(f(x)), np.asarray(jax.vmap(jnp.cumsum)(x)), rtol=1e-6
    )
