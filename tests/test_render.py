"""Tests for masked volumetric compositing (ops.render)."""

import numpy as np
import pytest

import jax.numpy as jnp

from gdb_nerf_tpu.ops import render


def spec_weights(sigma, valid):
    """Executable spec: the reference's documented fallback semantics
    (/root/reference/networks/gdb_nerf/utils.py:19-43) on one ray."""
    sigma = np.asarray(sigma, dtype=np.float64)
    alpha = (1.0 - np.exp(-sigma)) * valid
    T = 1.0
    w = np.zeros_like(alpha)
    for i in range(len(alpha)):
        w[i] = alpha[i] * T
        T *= 1.0 - alpha[i] + 1e-10
    return w / max(w.sum(), 1e-6)


def test_weights_match_spec(rng):
    S = 6
    sigma = rng.uniform(0, 3, (10, S)).astype(np.float32)
    valid = rng.uniform(size=(10, S)) > 0.3
    valid[:, 0] = True  # at least one valid sample per ray
    ours = np.asarray(render.weights_from_sigma(jnp.array(sigma), jnp.array(valid)))
    for r in range(10):
        np.testing.assert_allclose(
            ours[r], spec_weights(sigma[r], valid[r]), rtol=1e-4, atol=1e-6
        )


def test_weights_sum_to_one():
    sigma = jnp.array([[0.5, 1.0, 2.0, 0.1]])
    valid = jnp.ones((1, 4), bool)
    w = render.weights_from_sigma(sigma, valid)
    np.testing.assert_allclose(float(w.sum()), 1.0, rtol=1e-5)


def test_invalid_samples_get_zero_weight():
    sigma = jnp.array([[1.0, 5.0, 1.0, 1.0]])
    valid = jnp.array([[True, False, True, True]])
    w = np.asarray(render.weights_from_sigma(sigma, valid))
    assert w[0, 1] == 0.0
    np.testing.assert_allclose(w.sum(), 1.0, rtol=1e-5)


def test_all_invalid_ray_is_finite():
    sigma = jnp.array([[1.0, 2.0]])
    valid = jnp.zeros((1, 2), bool)
    w = np.asarray(render.weights_from_sigma(sigma, valid))
    assert np.isfinite(w).all()
    assert (w == 0).all()


def test_composite_shapes_and_values(rng):
    N, S, C = 7, 4, 5
    w = rng.uniform(0, 1, (N, S)).astype(np.float32)
    w /= w.sum(-1, keepdims=True)
    feat = rng.standard_normal((N, S, C)).astype(np.float32)
    z = rng.uniform(1, 5, (N, S)).astype(np.float32)
    fmap, dmap, op = render.composite(jnp.array(w), jnp.array(feat), jnp.array(z))
    assert fmap.shape == (N, C) and dmap.shape == (N,) and op.shape == (N,)
    np.testing.assert_allclose(
        np.asarray(fmap), (w[..., None] * feat).sum(1), rtol=1e-5
    )
    np.testing.assert_allclose(np.asarray(dmap), (w * z).sum(1), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(op), w.sum(1), rtol=1e-5)


def test_opaque_first_sample_dominates():
    """A very dense first sample should absorb ~all the weight."""
    sigma = jnp.array([[50.0, 1.0, 1.0]])
    valid = jnp.ones((1, 3), bool)
    w = np.asarray(render.weights_from_sigma(sigma, valid))
    assert w[0, 0] > 0.99
