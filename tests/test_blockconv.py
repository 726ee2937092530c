"""Exactness of the space-to-depth blocked conv rewrite (ops/blockconv.py)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from gdb_nerf_tpu.ops.blockconv import conv2d_blocked, conv3d_blocked


def _ref_conv2d(x, k):
    ph, pw = k.shape[0] // 2, k.shape[1] // 2
    return lax.conv_general_dilated(
        x, k, (1, 1), ((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _ref_conv3d(x, k):
    p = tuple((d // 2, d // 2) for d in k.shape[:3])
    return lax.conv_general_dilated(
        x, k, (1, 1, 1), p, dimension_numbers=("NDHWC", "DHWIO", "NDHWC")
    )


@pytest.mark.parametrize("s", [2, 4])
@pytest.mark.parametrize("khw", [(3, 3), (1, 1), (3, 1)])
def test_conv2d_blocked_exact(s, khw):
    key = jax.random.PRNGKey(0)
    x = jax.random.normal(key, (2, 16, 24, 5))
    k = jax.random.normal(jax.random.PRNGKey(1), (*khw, 5, 7))
    got = conv2d_blocked(x, k, s)
    want = _ref_conv2d(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


@pytest.mark.parametrize("s", [2, 4])
def test_conv3d_blocked_exact(s):
    key = jax.random.PRNGKey(2)
    x = jax.random.normal(key, (1, 6, 16, 8, 4))
    k = jax.random.normal(jax.random.PRNGKey(3), (3, 3, 3, 4, 6))
    got = conv3d_blocked(x, k, s)
    want = _ref_conv3d(x, k)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=1e-5)


def test_conv2d_blocked_grad_matches():
    # The rewrite is linear in both operands; check VJP agreement so the
    # train path can use it too.
    x = jax.random.normal(jax.random.PRNGKey(4), (1, 8, 8, 3))
    k = jax.random.normal(jax.random.PRNGKey(5), (3, 3, 3, 4))

    def loss_blocked(x, k):
        return jnp.sum(jnp.square(conv2d_blocked(x, k, 2)))

    def loss_ref(x, k):
        return jnp.sum(jnp.square(_ref_conv2d(x, k)))

    gb = jax.grad(loss_blocked, argnums=(0, 1))(x, k)
    gr = jax.grad(loss_ref, argnums=(0, 1))(x, k)
    for a, b in zip(gb, gr):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-4)
