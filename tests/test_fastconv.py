"""fastconv shift+dot lowering equals XLA's conv, incl. inside ConvBlock."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax import lax

from gdb_nerf_tpu.models import layers
from gdb_nerf_tpu.ops.fastconv import conv_shifts


@pytest.mark.parametrize(
    "nd,shape,cin,cout,k,stride,pad",
    [
        (2, (10, 12), 3, 8, 3, 1, 1),
        (2, (10, 12), 8, 16, 3, 2, 1),
        (2, (9, 11), 8, 8, 1, 1, 0),
        (3, (6, 8, 10), 8, 8, 3, 1, 1),
        (3, (6, 8, 10), 8, 16, 3, 2, 1),
    ],
)
def test_matches_xla_conv(rng, nd, shape, cin, cout, k, stride, pad):
    x = jnp.asarray(rng.normal(size=(2, *shape, cin)), jnp.float32)
    kernel = jnp.asarray(
        rng.normal(size=(k,) * nd + (cin, cout)) * 0.2, jnp.float32
    )
    dn = ("NHWC", "HWIO", "NHWC") if nd == 2 else ("NDHWC", "DHWIO", "NDHWC")
    ref = lax.conv_general_dilated(
        x, kernel, (stride,) * nd, [(pad, pad)] * nd, dimension_numbers=dn
    )
    got = conv_shifts(x, kernel, (stride,) * nd, [(pad, pad)] * nd)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_leading_dims(rng):
    # Arbitrary leading batch dims (the models map over (B, V, ...)).
    x = jnp.asarray(rng.normal(size=(2, 3, 8, 10, 4)), jnp.float32)
    kernel = jnp.asarray(rng.normal(size=(3, 3, 4, 6)) * 0.2, jnp.float32)
    ref = lax.conv_general_dilated(
        x.reshape(6, 8, 10, 4), kernel, (1, 1), [(1, 1)] * 2,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ).reshape(2, 3, 8, 10, 6)
    got = conv_shifts(x, kernel, (1, 1), [(1, 1)] * 2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_convblock_tree_and_value_identical(rng):
    """Flipping the lowering changes neither the param tree nor the output."""
    x = jnp.asarray(rng.normal(size=(1, 12, 14, 8)), jnp.float32)

    blk = layers.ConvBlock(16, (3, 3), padding=(1, 1))
    layers.set_fast_conv(False)
    try:
        v_slow = blk.init(jax.random.PRNGKey(0), x, train=False)
        out_slow = blk.apply(v_slow, x, train=False)
        layers.set_fast_conv(True)
        v_fast = blk.init(jax.random.PRNGKey(0), x, train=False)
        out_fast = blk.apply(v_slow, x, train=False)  # SAME params
    finally:
        layers.set_fast_conv(True)

    assert jax.tree_util.tree_structure(v_slow) == jax.tree_util.tree_structure(
        v_fast
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(v_slow), jax.tree_util.tree_leaves(v_fast)
    ):
        assert a.shape == b.shape and a.dtype == b.dtype
    np.testing.assert_allclose(
        np.asarray(out_fast), np.asarray(out_slow), rtol=2e-5, atol=2e-5
    )


@pytest.mark.parametrize("nd,shape,cin,cout", [
    (2, (6, 7), 4, 8),
    (3, (4, 5, 6), 8, 4),
])
def test_deconv_subpixel_matches_dilated_conv(rng, nd, shape, cin, cout):
    from gdb_nerf_tpu.ops.fastconv import deconv_subpixel

    x = jnp.asarray(rng.normal(size=(2, *shape, cin)), jnp.float32)
    kernel = jnp.asarray(
        rng.normal(size=(3,) * nd + (cin, cout)) * 0.2, jnp.float32
    )
    dn = ("NHWC", "HWIO", "NHWC") if nd == 2 else ("NDHWC", "DHWIO", "NDHWC")
    ref = lax.conv_general_dilated(
        x, kernel, (1,) * nd, [(1, 2)] * nd, lhs_dilation=(2,) * nd,
        dimension_numbers=dn,
    )
    got = deconv_subpixel(x, kernel)
    assert got.shape == ref.shape == (2, *(2 * s for s in shape), cout)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)


def test_deconvblock_lowering_equivalence(rng):
    x = jnp.asarray(rng.normal(size=(1, 4, 6, 8, 8)), jnp.float32)
    blk = layers.DeconvBlock(4, ndim=3)
    layers.set_fast_conv(False)
    try:
        v = blk.init(jax.random.PRNGKey(0), x, train=False)
        ref = blk.apply(v, x, train=False)
        layers.set_fast_conv(True)
        got = blk.apply(v, x, train=False)
    finally:
        layers.set_fast_conv(True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=2e-5, atol=2e-5)
