"""Differential tests: D-folded 2D convs == 3D convs (ops/dfold.py).

Each fold transform is checked against the corresponding lax 3D convolution
on random tensors at stage-1-like (but tiny) shapes, including the odd-D
banding boundaries, stride-2 downsampling, and the lhs-dilated transposed
conv used by DeconvBlock.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from gdb_nerf_tpu.ops import dfold


def _conv3d(x, w, strides=(1, 1, 1), padding="SAME", lhs_dilation=None,
            pad_override=None):
    return lax.conv_general_dilated(
        x, w, strides, pad_override or padding, lhs_dilation=lhs_dilation,
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )


def _conv2d(x, w, strides=(1, 1), padding="SAME", lhs_dilation=None,
            pad_override=None):
    return lax.conv_general_dilated(
        x, w, strides, pad_override or padding, lhs_dilation=lhs_dilation,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


@pytest.mark.parametrize("D", [4, 8])
def test_fold_volume_roundtrip(rng, D):
    x = jnp.asarray(rng.normal(size=(2, D, 5, 6, 3)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(dfold.unfold_volume(dfold.fold_volume(x), D)),
        np.asarray(x),
    )


@pytest.mark.parametrize("D", [4, 8])
def test_fold_kernel_matches_3d_conv(rng, D):
    Ci, Co = 3, 5
    x = jnp.asarray(rng.normal(size=(2, D, 6, 7, Ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)), jnp.float32)
    ref = _conv3d(x, w)
    got = dfold.unfold_volume(
        _conv2d(dfold.fold_volume(x), dfold.fold_kernel(w, D)), D
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("D", [4, 8])
def test_fold_kernel_strided_matches_3d_conv(rng, D):
    Ci, Co = 3, 4
    x = jnp.asarray(rng.normal(size=(1, D, 8, 6, Ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)), jnp.float32)
    # torch stride-2 pad-1 arithmetic (what ConvBlock uses).
    ref = _conv3d(x, w, strides=(2, 2, 2), pad_override=[(1, 1)] * 3)
    got = dfold.unfold_volume(
        _conv2d(
            dfold.fold_volume(x), dfold.fold_kernel_strided(w, D),
            strides=(2, 2), pad_override=[(1, 1)] * 2,
        ),
        D // 2,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("D", [2, 4])
def test_fold_kernel_deconv_matches_3d_deconv(rng, D):
    Ci, Co = 3, 4
    x = jnp.asarray(rng.normal(size=(1, D, 4, 5, Ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)), jnp.float32)
    # DeconvBlock's lhs-dilated transposed conv: out = 2 * in per dim.
    ref = _conv3d(x, w, lhs_dilation=(2, 2, 2), pad_override=[(1, 2)] * 3)
    got = dfold.unfold_volume(
        _conv2d(
            dfold.fold_volume(x), dfold.fold_kernel_deconv(w, D),
            lhs_dilation=(2, 2), pad_override=[(1, 2)] * 2,
        ),
        2 * D,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fold_kernel_deconv_matches_subpixel(rng):
    """The folded 2D deconv also runs through the subpixel lowering."""
    from gdb_nerf_tpu.ops.fastconv import deconv_subpixel

    D, Ci, Co = 4, 2, 3
    x = jnp.asarray(rng.normal(size=(1, D, 4, 6, Ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)), jnp.float32)
    ref = _conv3d(x, w, lhs_dilation=(2, 2, 2), pad_override=[(1, 2)] * 3)
    got = dfold.unfold_volume(
        deconv_subpixel(dfold.fold_volume(x), dfold.fold_kernel_deconv(w, D)),
        2 * D,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_cost_reg_net_folded_matches_3d(rng):
    """The depth-folded CostRegNet path == the 3D path, from the SAME
    variables (init under either path must produce the identical tree)."""
    from gdb_nerf_tpu.models import layers
    from gdb_nerf_tpu.models.cost_reg_net import CostRegNet

    net = CostRegNet(out_channels=8, base_channels=8)
    x = jnp.asarray(rng.normal(size=(1, 8, 16, 24, 8)), jnp.float32)

    layers.set_dfold(False)
    try:
        v3d = net.init(jax.random.PRNGKey(0), x, train=False)
        feat3, prob3 = net.apply(v3d, x, train=False)
        layers.set_dfold(True)
        vf = net.init(jax.random.PRNGKey(0), x, train=False)
        # identical param trees regardless of which path ran init
        assert jax.tree_util.tree_structure(v3d) == jax.tree_util.tree_structure(vf)
        for a, b in zip(jax.tree_util.tree_leaves(v3d), jax.tree_util.tree_leaves(vf)):
            assert a.shape == b.shape and a.dtype == b.dtype
        featf, probf = net.apply(v3d, x, train=False)
    finally:
        layers.set_dfold(True)
    np.testing.assert_allclose(np.asarray(featf), np.asarray(feat3),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(probf), np.asarray(prob3),
                               rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("D,k", [(8, 4), (16, 8)])
def test_fold_block_roundtrip(rng, D, k):
    x = jnp.asarray(rng.normal(size=(2, D, 5, 6, 3)), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(dfold.unfold_volume_block(dfold.fold_volume_block(x, k), k)),
        np.asarray(x),
    )


@pytest.mark.parametrize("D,k", [(8, 4), (16, 8)])
def test_fold_kernel_block_matches_3d_conv(rng, D, k):
    Ci, Co = 3, 4
    x = jnp.asarray(rng.normal(size=(1, D, 6, 7, Ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)), jnp.float32)
    ref = _conv3d(x, w)
    got = dfold.unfold_volume_block(
        _conv3d(dfold.fold_volume_block(x, k), dfold.fold_kernel_block(w, k)),
        k,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("D,k", [(8, 4), (16, 8)])
def test_fold_kernel_block_strided_matches_3d_conv(rng, D, k):
    Ci, Co = 3, 4
    x = jnp.asarray(rng.normal(size=(1, D, 8, 6, Ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)), jnp.float32)
    ref = _conv3d(x, w, strides=(2, 2, 2), pad_override=[(1, 1)] * 3)
    got = dfold.unfold_volume_block(
        _conv3d(
            dfold.fold_volume_block(x, k),
            dfold.fold_kernel_block_strided(w, k),
            strides=(2, 2, 2),
            pad_override=[(1, 1)] * 3,
        ),
        k,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("D,k", [(4, 2), (8, 4)])
def test_fold_kernel_block_deconv_matches_3d_deconv(rng, D, k):
    Ci, Co = 2, 3
    x = jnp.asarray(rng.normal(size=(1, D, 4, 5, Ci)), jnp.float32)
    w = jnp.asarray(rng.normal(size=(3, 3, 3, Ci, Co)), jnp.float32)
    ref = _conv3d(x, w, lhs_dilation=(2, 2, 2), pad_override=[(1, 2)] * 3)
    got = dfold.unfold_volume_block(
        _conv3d(
            dfold.fold_volume_block(x, k),
            dfold.fold_kernel_block_deconv(w, k),
            lhs_dilation=(2, 2, 2),
            pad_override=[(1, 2)] * 3,
        ),
        k,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_cost_reg_net_small_block_folded_matches_3d(rng):
    """Block-folded CostRegNetSmall (stage-0) == 3D path, shared variables."""
    from gdb_nerf_tpu.models import layers
    from gdb_nerf_tpu.models.cost_reg_net import CostRegNetSmall

    net = CostRegNetSmall(out_channels=8, base_channels=8)
    x = jnp.asarray(rng.normal(size=(1, 32, 8, 12, 8)), jnp.float32)

    layers.set_dfold(False)
    try:
        v3d = net.init(jax.random.PRNGKey(0), x, train=False)
        feat3, prob3 = net.apply(v3d, x, train=False)
        layers.set_dfold(True)
        vf = net.init(jax.random.PRNGKey(0), x, train=False)
        assert jax.tree_util.tree_structure(v3d) == jax.tree_util.tree_structure(vf)
        for a, b in zip(jax.tree_util.tree_leaves(v3d), jax.tree_util.tree_leaves(vf)):
            assert a.shape == b.shape and a.dtype == b.dtype
        featf, probf = net.apply(v3d, x, train=False)
    finally:
        layers.set_dfold(True)
    np.testing.assert_allclose(np.asarray(featf), np.asarray(feat3),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(probf), np.asarray(prob3),
                               rtol=1e-4, atol=1e-5)
