"""Tests for eval metrics (PSNR/SSIM) and training losses."""

import numpy as np
import pytest

import jax.numpy as jnp

from gdb_nerf_tpu.eval import metrics
from gdb_nerf_tpu.train import losses


def test_psnr_known_value():
    gt = np.zeros((10, 10))
    pred = np.full((10, 10), 0.1)
    # mse = 0.01 -> psnr = 20
    assert abs(metrics.psnr(gt, pred, 1.0) - 20.0) < 1e-6


def test_psnr_identical_is_inf():
    x = np.random.default_rng(0).uniform(size=(8, 8))
    assert metrics.psnr(x, x) == float("inf")


def test_ssim_identical_is_one(rng):
    x = rng.uniform(size=(32, 32, 3))
    assert abs(metrics.ssim(x, x) - 1.0) < 1e-9


def test_ssim_decreases_with_noise(rng):
    x = rng.uniform(size=(32, 32, 3))
    small = metrics.ssim(x, np.clip(x + rng.normal(0, 0.05, x.shape), 0, 1))
    large = metrics.ssim(x, np.clip(x + rng.normal(0, 0.3, x.shape), 0, 1))
    assert 0 < large < small < 1


def test_ssim_matches_torch_reference_formula(rng):
    """Cross-check against an independent torch implementation of the same
    uniform-window SSIM (unbiased covariances, border crop)."""
    import torch
    import torch.nn.functional as F

    x = rng.uniform(size=(24, 24)).astype(np.float64)
    y = rng.uniform(size=(24, 24)).astype(np.float64)
    ours = metrics._ssim_single(x, y, 1.0, 7)

    win = 7
    tx = torch.from_numpy(x)[None, None]
    ty = torch.from_numpy(y)[None, None]
    kernel = torch.ones(1, 1, win, win, dtype=torch.float64) / win**2
    pad = 0
    f = lambda t: F.conv2d(t, kernel)
    ux, uy = f(tx), f(ty)
    NP = win * win
    cov_norm = NP / (NP - 1)
    vx = cov_norm * (f(tx * tx) - ux * ux)
    vy = cov_norm * (f(ty * ty) - uy * uy)
    vxy = cov_norm * (f(tx * ty) - ux * uy)
    C1, C2 = 0.01**2, 0.03**2
    S = ((2 * ux * uy + C1) * (2 * vxy + C2)) / (
        (ux * ux + uy * uy + C1) * (vx + vy + C2)
    )
    # valid-conv S corresponds to the cropped center of our same-conv map.
    ref = S.mean().item()
    assert abs(ours - ref) < 5e-3  # boundary handling differs slightly


def test_train_ssim_near_one_for_identical(rng):
    x = jnp.array(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
    val = float(losses.ssim(x, x))
    assert val > 0.99


def test_photometric_loss_components(rng):
    gt = jnp.array(rng.uniform(size=(1, 16, 16, 3)).astype(np.float32))
    total, mse, s, p = losses.photometric_loss(gt, gt, (1.0, 0.1, 0.0))
    assert float(mse) < 1e-10
    assert float(total) < 1e-2  # only the tiny (1 - ssim) term remains


def test_smooth_l1_depth_masked():
    est = [jnp.ones((1, 4, 4)) * 2.0]
    gt = [jnp.ones((1, 4, 4)) * 2.5]
    mask = [jnp.ones((1, 4, 4))]
    loss, stats = losses.smooth_l1_depth(est, gt, mask, [1.0])
    assert abs(float(loss) - 0.125) < 1e-6  # 0.5 * 0.5^2
    # fully masked-out -> zero loss, no NaN
    loss0, _ = losses.smooth_l1_depth(est, gt, [jnp.zeros((1, 4, 4))], [1.0])
    assert float(loss0) == 0.0


def test_ssim_filter_custom_vjp_matches_autodiff_grad(rng):
    """losses._filter's hand-written backward (symmetric-window forward
    conv) == autodiff through the plain conv implementation."""
    import jax
    import jax.numpy as jnp
    from gdb_nerf_tpu.train import losses

    x = jnp.asarray(rng.normal(0.5, 0.2, (2, 12, 14, 3)), jnp.float32)
    y = jnp.asarray(rng.normal(0.5, 0.2, (2, 12, 14, 3)), jnp.float32)
    w = jnp.asarray(losses._WINDOW)

    def ssim_with(filt, a, b):
        mu1, mu2 = filt(a, w), filt(b, w)
        mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
        s1 = filt(a * a, w) - mu1_sq
        s2 = filt(b * b, w) - mu2_sq
        s12 = filt(a * b, w) - mu12
        C1, C2 = 0.01**2, 0.03**2
        smap = ((2 * mu12 + C1) * (2 * s12 + C2)) / (
            (mu1_sq + mu2_sq + C1) * (s1 + s2 + C2)
        )
        return jnp.mean(smap)

    g_custom = jax.grad(lambda a: ssim_with(losses._filter, a, y))(x)
    g_plain = jax.grad(lambda a: ssim_with(losses._filter_impl, a, y))(x)
    np.testing.assert_allclose(
        np.asarray(g_custom), np.asarray(g_plain), rtol=1e-5, atol=1e-6
    )
    np.testing.assert_allclose(
        float(losses.ssim(x, y)), float(ssim_with(losses._filter_impl, x, y)),
        rtol=1e-6,
    )
