"""Differential tests of conv building blocks against torch semantics."""

import numpy as np
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp


def test_deconv_arithmetic_matches_torch_convtranspose3d(rng):
    """Our lhs-dilated conv with padding (1,2) and a flipped/transposed
    kernel reproduces torch ConvTranspose3d(k=3, s=2, p=1, op=1) exactly —
    the mapping the torch checkpoint converter relies on."""
    Cin, Cout, D, H, W = 3, 4, 5, 6, 7
    x = rng.standard_normal((1, Cin, D, H, W)).astype(np.float32)
    w_t = rng.standard_normal((Cin, Cout, 3, 3, 3)).astype(np.float32)

    ref = F.conv_transpose3d(
        torch.from_numpy(x), torch.from_numpy(w_t),
        stride=2, padding=1, output_padding=1,
    ).numpy()  # (1, Cout, 2D, 2H, 2W)

    # torch (in, out, kd, kh, kw) -> flip spatial -> DHWIO
    w_j = w_t[:, :, ::-1, ::-1, ::-1].transpose(2, 3, 4, 0, 1).copy()
    x_j = x.transpose(0, 2, 3, 4, 1)  # NDHWC
    out = jax.lax.conv_general_dilated(
        jnp.asarray(x_j),
        jnp.asarray(w_j),
        window_strides=(1, 1, 1),
        padding=[(1, 2), (1, 2), (1, 2)],
        lhs_dilation=(2, 2, 2),
        dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
    )
    out = np.asarray(out).transpose(0, 4, 1, 2, 3)
    assert out.shape == ref.shape == (1, Cout, 2 * D, 2 * H, 2 * W)
    np.testing.assert_allclose(out, ref, rtol=1e-4, atol=1e-5)


def test_conv_block_stride2_shape_matches_torch(rng):
    """flax Conv with explicit (p, p) padding matches torch Conv2d shapes
    for the FPN's k5 s2 p2 downsamples on odd sizes."""
    from gdb_nerf_tpu.models.layers import ConvBlock

    x = jnp.array(rng.standard_normal((1, 13, 17, 3)).astype(np.float32))
    blk = ConvBlock(8, (5, 5), strides=(2, 2), padding=(2, 2))
    vars_ = blk.init(jax.random.PRNGKey(0), x, train=False)
    y = blk.apply(vars_, x, train=False)
    tshape = F.conv2d(
        torch.zeros(1, 3, 13, 17), torch.zeros(8, 3, 5, 5), stride=2, padding=2
    ).shape
    assert y.shape == (1, tshape[2], tshape[3], 8)


def test_batchnorm_matches_torch_eval(rng):
    """Inference-mode BN with given running stats matches torch BatchNorm2d."""
    import flax.linen as nn

    C = 6
    x = rng.standard_normal((2, 4, 5, C)).astype(np.float32)
    mean = rng.standard_normal(C).astype(np.float32)
    var = rng.uniform(0.5, 2.0, C).astype(np.float32)
    scale = rng.standard_normal(C).astype(np.float32)
    bias = rng.standard_normal(C).astype(np.float32)

    bn = nn.BatchNorm(use_running_average=True, momentum=0.9, epsilon=1e-5)
    variables = {
        "params": {"scale": jnp.asarray(scale), "bias": jnp.asarray(bias)},
        "batch_stats": {"mean": jnp.asarray(mean), "var": jnp.asarray(var)},
    }
    ours = np.asarray(bn.apply(variables, jnp.asarray(x)))

    tbn = torch.nn.BatchNorm2d(C, eps=1e-5)
    tbn.eval()
    with torch.no_grad():
        tbn.running_mean.copy_(torch.from_numpy(mean))
        tbn.running_var.copy_(torch.from_numpy(var))
        tbn.weight.copy_(torch.from_numpy(scale))
        tbn.bias.copy_(torch.from_numpy(bias))
        ref = tbn(torch.from_numpy(x.transpose(0, 3, 1, 2))).numpy()
    np.testing.assert_allclose(
        ours, ref.transpose(0, 2, 3, 1), rtol=1e-5, atol=1e-5
    )


def test_pixel_shuffle_matches_torch(rng):
    from gdb_nerf_tpu.ops.resize import pixel_shuffle

    x = rng.standard_normal((12, 5, 6)).astype(np.float32)  # C=12=3*2*2, H, W
    x_hwc = x.transpose(1, 2, 0)
    ours = np.asarray(pixel_shuffle(jnp.asarray(x_hwc), 2))
    ref = F.pixel_shuffle(torch.from_numpy(x)[None], 2)[0].numpy()
    np.testing.assert_allclose(ours, ref.transpose(1, 2, 0), rtol=1e-6)


def test_resize_bilinear_matches_torch_interpolate(rng):
    from gdb_nerf_tpu.ops.resize import resize_bilinear

    img = rng.standard_normal((12, 16, 3)).astype(np.float32)
    ours = np.asarray(resize_bilinear(jnp.asarray(img), (7, 9)))
    ref = F.interpolate(
        torch.from_numpy(img.transpose(2, 0, 1))[None],
        size=(7, 9),
        mode="bilinear",
        align_corners=False,
    )[0].numpy()
    np.testing.assert_allclose(ours, ref.transpose(1, 2, 0), rtol=1e-4, atol=1e-5)


def test_resize_nearest_matches_torch(rng):
    from gdb_nerf_tpu.ops.resize import resize_nearest

    img = rng.standard_normal((10, 14, 2)).astype(np.float32)
    ours = np.asarray(resize_nearest(jnp.asarray(img), (5, 9)))
    ref = F.interpolate(
        torch.from_numpy(img.transpose(2, 0, 1))[None], size=(5, 9), mode="nearest"
    )[0].numpy()
    np.testing.assert_allclose(ours, ref.transpose(1, 2, 0), rtol=1e-6)


def test_resize_bilinear_integer_factor_fast_path(rng):
    """The strided-slice integer-factor downscale must match both the torch
    protocol and the general grid path (which it replaces on the frame's
    src_small resize)."""
    from gdb_nerf_tpu.ops.resize import resize_bilinear

    img = rng.standard_normal((16, 24, 3)).astype(np.float32)
    for out in [(8, 12), (4, 6), (8, 8), (16, 3)]:
        ours = np.asarray(resize_bilinear(jnp.asarray(img), out))
        ref = F.interpolate(
            torch.from_numpy(img.transpose(2, 0, 1))[None],
            size=out,
            mode="bilinear",
            align_corners=False,
        )[0].numpy()
        np.testing.assert_allclose(
            ours, ref.transpose(1, 2, 0), rtol=1e-5, atol=1e-6,
            err_msg=str(out),
        )


def test_resize_bilinear_integer_upscale_fast_path(rng):
    """The phase-static slice upscale (k*H, k*W) must match torch
    F.interpolate and the general grid path it replaces (the depth/opacity
    maps upscale (H/b, W/b) -> full res every frame)."""
    from gdb_nerf_tpu.ops.resize import resize_bilinear

    img = rng.standard_normal((8, 10, 3)).astype(np.float32)
    for out in [(16, 20), (32, 40), (24, 30), (16, 10), (8, 30)]:
        ours = np.asarray(resize_bilinear(jnp.asarray(img), out))
        ref = F.interpolate(
            torch.from_numpy(img.transpose(2, 0, 1))[None],
            size=out,
            mode="bilinear",
            align_corners=False,
        )[0].numpy()
        # atol 3e-6: the separable y-then-x order differs from torch's
        # x-then-y in the last ulp for odd factors.
        np.testing.assert_allclose(
            ours, ref.transpose(1, 2, 0), rtol=1e-5, atol=3e-6,
            err_msg=str(out),
        )
        # Under jit too: phase constants must stay trace-safe (the first
        # version died with ConcretizationTypeError inside the depth-range
        # upscale of the real eval graph).
        import jax

        jitted = np.asarray(
            jax.jit(lambda t: resize_bilinear(t, out))(jnp.asarray(img))
        )
        np.testing.assert_allclose(jitted, ours, rtol=1e-6, atol=1e-6)
