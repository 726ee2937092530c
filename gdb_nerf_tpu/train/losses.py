"""Training losses: photometric (MSE + SSIM + VGG-perceptual) and depth L1.

Equivalent of the reference loss stack (/root/reference/train/losses/):
  * ``ssim``: windowed SSIM with a 7x7 gaussian (sigma 1.5) window
    (ssim_loss.py:22-58).
  * ``vgg_perceptual``: frozen VGG16 feature L1 at the 4 standard blocks,
    ImageNet-normalized (vgg_perceptual_loss.py) — needs converted weights
    (tools/export_vgg.py -> $workspace/weights/vgg16.npz); contributes 0
    with a one-time notice when absent (no egress in this environment).
  * ``photometric_loss``: alpha*MSE + beta*(1-SSIM) + gamma*perceptual with
    weights (1.0, 0.1, 0.05) (photometric_loss.py:7-21).
  * ``smooth_l1_depth``: masked multiscale Smooth-L1 depth monitoring
    (depth_loss.py).

All functions take channels-last (B, H, W, 3) images and are jit-safe.
"""

from __future__ import annotations

import os
from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np


def _gaussian_window(size: int = 7, sigma: float = 1.5) -> np.ndarray:
    g = np.arange(size, dtype=np.float64)
    g = np.exp(-((g - size // 2) ** 2) / (2 * sigma**2))
    g /= g.sum()
    w = np.outer(g, g)
    return w.astype(np.float32)


_WINDOW = _gaussian_window()


def _filter_impl(img: jax.Array, window: jax.Array) -> jax.Array:
    """Depthwise 2D conv of (B, H, W, C) with an (k, k) window, SAME padding
    of k//2 (matches F.conv2d(padding=k//2, groups=C))."""
    k = window.shape[0]
    C = img.shape[-1]
    kernel = jnp.tile(window[:, :, None, None], (1, 1, 1, C))  # (k, k, 1, C)
    return jax.lax.conv_general_dilated(
        img,
        kernel,
        window_strides=(1, 1),
        padding=[(k // 2, k // 2), (k // 2, k // 2)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=C,
    )


@jax.custom_vjp
def _filter(img: jax.Array, window: jax.Array) -> jax.Array:
    return _filter_impl(img, window)


def _filter_fwd(img, window):
    return _filter_impl(img, window), window


def _filter_bwd(window, ct):
    # The adjoint of a stride-1 SAME depthwise conv is the conv with the
    # spatially-flipped kernel; the gaussian window is flip-symmetric, so
    # the backward IS the forward conv.  Routing it this way avoids XLA's
    # transposed-conv input gradient, whose batch-minor layout padded a
    # (4, 512, 640, 3) cotangent 42.7x (640 MB) and OOM'd the shipped
    # 512x640 B=4 training recipe.
    return _filter_impl(ct, window), jnp.zeros_like(window)


_filter.defvjp(_filter_fwd, _filter_bwd)


def ssim(img1: jax.Array, img2: jax.Array, window_size: int = 7) -> jax.Array:
    """Mean SSIM over a batch of (B, H, W, C) images (train-loss variant)."""
    w = jnp.asarray(_WINDOW if window_size == 7 else _gaussian_window(window_size))
    mu1 = _filter(img1, w)
    mu2 = _filter(img2, w)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = _filter(img1 * img1, w) - mu1_sq
    s2 = _filter(img2 * img2, w) - mu2_sq
    s12 = _filter(img1 * img2, w) - mu12
    C1, C2 = 0.01**2, 0.03**2
    smap = ((2 * mu12 + C1) * (2 * s12 + C2)) / ((mu1_sq + mu2_sq + C1) * (s1 + s2 + C2))
    return jnp.mean(smap)


@lru_cache(maxsize=1)
def _vgg_weights():
    ws = os.environ.get("workspace", os.path.join(os.getcwd(), "workspace"))
    path = os.path.join(ws, "weights", "vgg16.npz")
    if not os.path.exists(path):
        print(f"[losses] VGG16 weights not found at {path}; perceptual term off")
        return None
    data = dict(np.load(path))
    # Provenance check: all-zero biases are the fingerprint of
    # tools/export_vgg.py::random_state_dict (the no-egress fallback), not
    # pretrained torchvision VGG16 (every pretrained conv bias is nonzero).
    # Fixed random conv features still carry perceptual signal, but the
    # term is NOT the reference's ImageNet-VGG loss
    # (/root/reference/train/losses/vgg_perceptual_loss.py:9-12) — say so
    # loudly every run rather than silently training against it.
    if all(np.all(data[f"conv{i}_b"] == 0.0) for i in range(10)):
        print(
            "[losses] WARNING: vgg16.npz is the RANDOM-weights fallback "
            "(fixed random features, not pretrained VGG16). Export real "
            "weights with tools/export_vgg.py on a machine with "
            "torchvision and replace the file. See WEIGHTS.md."
        )
    # Cache NUMPY arrays, not jnp: this function can first run inside a jit/
    # shard_map trace, where jnp.asarray yields trace-local constants — an
    # lru_cache of those leaks tracers into every later trace
    # (UnexpectedTracerError on the 2nd compile).  numpy operands are
    # converted to fresh per-trace constants by JAX at use sites.
    return data


_VGG_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_VGG_STD = np.array([0.229, 0.224, 0.225], np.float32)
# Conv counts of the four feature blocks [:4], [4:9], [9:16], [16:23].
_VGG_BLOCKS = [2, 2, 3, 3]


def vgg_perceptual(img1: jax.Array, img2: jax.Array) -> jax.Array:
    """L1 feature distance over VGG16 blocks; 0 if weights unavailable.

    Rematerialized AND batch-chunked: at the shipped 512x640 B=4 recipe the
    stored VGG activations alone exceed HBM (measured: 16.52G needed of
    15.75G, with ~3.8G of f32 VGG block temps).  jax.checkpoint alone is
    not enough — the backward recompute still materializes all B samples'
    block taps at once (train_net.py at the shipped recipe OOM'd on it
    while the perceptual-off step fit) — so the checkpointed loss runs
    per-sample under lax.map: peak extra memory is ONE sample's VGG
    forward.  Per-sample means average to the whole-batch mean exactly
    (equal-size chunks), so the value is unchanged.
    """
    w = _vgg_weights()
    if w is None:
        return jnp.asarray(0.0, img1.dtype)

    def features(x):
        h = (x - _VGG_MEAN) / _VGG_STD
        taps = []
        li = 0
        for bi, n_convs in enumerate(_VGG_BLOCKS):
            for _ in range(n_convs):
                h = jax.lax.conv_general_dilated(
                    h, w[f"conv{li}_w"], (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                h = jax.nn.relu(h + w[f"conv{li}_b"])
                li += 1
            taps.append(h)
            if bi < len(_VGG_BLOCKS) - 1:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        return taps

    @jax.checkpoint
    def _loss(i1, i2):
        acc = 0.0
        for a, b in zip(features(i1), features(i2)):
            acc = acc + jnp.mean(jnp.abs(a - b))
        return acc

    if img1.ndim == 4 and img1.shape[0] > 1:
        per_sample = jax.lax.map(
            lambda pair: _loss(pair[0][None], pair[1][None]), (img1, img2)
        )
        return jnp.mean(per_sample)
    return _loss(img1, img2)


def photometric_loss(
    gt: jax.Array,
    pred: jax.Array,
    weights: tuple[float, float, float] = (1.0, 0.1, 0.05),
):
    """Returns (total, mse, ssim_value, perceptual)."""
    alpha, beta, gamma = weights
    mse = jnp.mean(jnp.square(gt - pred))
    s = ssim(gt, pred)
    p = vgg_perceptual(gt, pred) if gamma > 0 else jnp.asarray(0.0)
    total = alpha * mse + beta * (1.0 - s) + gamma * p
    return total, mse, s, p


def smooth_l1(x: jax.Array, y: jax.Array) -> jax.Array:
    d = jnp.abs(x - y)
    return jnp.where(d < 1.0, 0.5 * d * d, d - 0.5)


def smooth_l1_depth(
    depth_est: list[jax.Array],
    depth_gt: list[jax.Array],
    masks: list[jax.Array],
    rates: list[float],
):
    """Masked multiscale Smooth-L1 depth error (monitoring only)."""
    loss = 0.0
    stats = {}
    for i, rate in enumerate(rates):
        m = masks[i] > 0.5
        denom = jnp.maximum(jnp.sum(m), 1)
        li = jnp.sum(smooth_l1(depth_est[i], depth_gt[i]) * m) / denom
        stats[f"depth_loss{i}"] = li
        loss = loss + rate * li
    return loss, stats
