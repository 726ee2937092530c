"""VGG perceptual loss + LPIPS paths, exercised with tiny random weights.

The real pretrained weights can't be downloaded here (zero egress), so these
tests build VGG-*shaped* random weights, write them where the loaders look
($workspace/weights/*.npz), and verify the JAX implementations against torch
replicas of the reference semantics
(/root/reference/train/losses/vgg_perceptual_loss.py:22-45 and the lpips
library's LPIPS(net='vgg') forward).  tools/export_vgg.py's state-dict
collection is also covered with a random torch VGG-like stack.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as TF

import jax.numpy as jnp

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))


# Tiny VGG plan: same block structure as VGG16, small channel counts.
_TINY_CH = [4, 4, 6, 6, 8, 8, 8, 8, 8, 8]  # 2 + 2 + 3 + 3 convs
_BLOCKS = [2, 2, 3, 3]


def _make_tiny_vgg(rng):
    """Random torch VGG-like features[:23] stack + matching npz dict."""
    layers = []
    weights = {}
    cin = 3
    li = 0
    for bi, n in enumerate(_BLOCKS):
        if bi > 0:
            layers.append(nn.MaxPool2d(2, 2))
        for _ in range(n):
            conv = nn.Conv2d(cin, _TINY_CH[li], 3, padding=1)
            conv.weight.data = torch.tensor(
                rng.normal(0, 0.3, conv.weight.shape).astype(np.float32)
            )
            conv.bias.data = torch.tensor(
                rng.normal(0, 0.1, conv.bias.shape).astype(np.float32)
            )
            layers += [conv, nn.ReLU()]
            weights[f"conv{li}_w"] = conv.weight.detach().numpy().transpose(2, 3, 1, 0)
            weights[f"conv{li}_b"] = conv.bias.detach().numpy()
            cin = _TINY_CH[li]
            li += 1
    return nn.Sequential(*layers).eval(), weights


def _torch_vgg_perceptual(feats, img1, img2):
    """Reference VGGPerceptualLoss semantics (vgg_perceptual_loss.py:22-45)."""
    mean = torch.tensor([0.485, 0.456, 0.406]).view(1, 3, 1, 1)
    std = torch.tensor([0.229, 0.224, 0.225]).view(1, 3, 1, 1)
    x = (img1 - mean) / std
    y = (img2 - mean) / std
    # split the flat stack into the reference's 4 blocks
    blocks, cur, convs = [], [], 0
    target = iter(_BLOCKS)
    want = next(target)
    for layer in feats:
        cur.append(layer)
        if isinstance(layer, nn.ReLU):
            convs += 1
            if convs == want:
                blocks.append(nn.Sequential(*cur))
                cur, convs = [], 0
                want = next(target, None)
    loss = 0.0
    for block in blocks:
        x = block(x)
        y = block(y)
        loss = loss + TF.l1_loss(x, y)
    return loss


def test_vgg_perceptual_matches_torch(rng, tmp_path, monkeypatch):
    feats, weights = _make_tiny_vgg(rng)
    wdir = tmp_path / "weights"
    wdir.mkdir()
    np.savez(wdir / "vgg16.npz", **weights)
    monkeypatch.setenv("workspace", str(tmp_path))

    from gdb_nerf_tpu.train import losses

    losses._vgg_weights.cache_clear()
    try:
        img1 = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        img2 = rng.uniform(size=(2, 32, 32, 3)).astype(np.float32)
        with torch.no_grad():
            ref = _torch_vgg_perceptual(
                feats,
                torch.tensor(img1).permute(0, 3, 1, 2),
                torch.tensor(img2).permute(0, 3, 1, 2),
            ).item()
        ours = float(losses.vgg_perceptual(jnp.asarray(img1), jnp.asarray(img2)))
        np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)

        # photometric_loss picks the term up with gamma > 0
        total, mse, s, p = losses.photometric_loss(
            jnp.asarray(img1), jnp.asarray(img2)
        )
        assert float(p) > 0.0
        np.testing.assert_allclose(float(p), ref, rtol=1e-4, atol=1e-5)
        np.testing.assert_allclose(
            float(total), float(mse) + 0.1 * (1 - float(s)) + 0.05 * float(p),
            rtol=1e-5,
        )
    finally:
        losses._vgg_weights.cache_clear()


def test_vgg_perceptual_absent_weights(tmp_path, monkeypatch):
    monkeypatch.setenv("workspace", str(tmp_path))
    from gdb_nerf_tpu.train import losses

    losses._vgg_weights.cache_clear()
    try:
        z = losses.vgg_perceptual(jnp.zeros((1, 8, 8, 3)), jnp.ones((1, 8, 8, 3)))
        assert float(z) == 0.0
    finally:
        losses._vgg_weights.cache_clear()


def test_export_vgg_state_dict_collection(rng):
    """tools/export_vgg.py collects exactly the 10 convs in HWIO layout."""
    from export_vgg import export_state_dict

    # Build a VGG16-features[:23]-shaped stack (real channel plan) randomly.
    plan = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512]
    layers = []
    cin = 3
    li = 0
    for bi, n in enumerate(_BLOCKS):
        if bi > 0:
            layers.append(nn.MaxPool2d(2, 2))
        for _ in range(n):
            layers += [nn.Conv2d(cin, plan[li], 3, padding=1), nn.ReLU()]
            cin = plan[li]
            li += 1
    out = export_state_dict(nn.Sequential(*layers))
    assert sorted(out) == sorted(
        [f"conv{i}_w" for i in range(10)] + [f"conv{i}_b" for i in range(10)]
    )
    assert out["conv0_w"].shape == (3, 3, 3, 64)
    assert out["conv9_w"].shape == (3, 3, 512, 512)


# ---------------------------------------------------------------------------
# LPIPS
# ---------------------------------------------------------------------------

_LPIPS_PLAN = [(4, 2), (4, 2), (6, 3), (6, 3), (8, 3)]  # (channels, convs)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def _make_tiny_lpips(rng):
    weights = {}
    cin = 3
    li = 0
    for ch, n in _LPIPS_PLAN:
        for _ in range(n):
            weights[f"conv{li}_w"] = rng.normal(0, 0.3, (3, 3, cin, ch)).astype(
                np.float32
            )
            weights[f"conv{li}_b"] = rng.normal(0, 0.1, (ch,)).astype(np.float32)
            cin = ch
            li += 1
    for i, (ch, _) in enumerate(_LPIPS_PLAN):
        weights[f"lin{i}_w"] = rng.uniform(0, 1, (ch,)).astype(np.float32)
    return weights


def _torch_lpips(weights, a, b):
    """lpips.LPIPS(net='vgg') forward semantics: scaling layer, VGG taps,
    channel unit-norm, squared diff, nonneg 1x1 head, spatial mean, sum."""

    def feats(x):
        h = (x - torch.tensor(_LPIPS_SHIFT).view(1, 3, 1, 1)) / torch.tensor(
            _LPIPS_SCALE
        ).view(1, 3, 1, 1)
        taps = []
        li = 0
        for bi, (ch, n) in enumerate(_LPIPS_PLAN):
            for _ in range(n):
                w = torch.tensor(weights[f"conv{li}_w"]).permute(3, 2, 0, 1)
                bias = torch.tensor(weights[f"conv{li}_b"])
                h = TF.relu(TF.conv2d(h, w, bias, padding=1))
                li += 1
            taps.append(h)
            if bi < len(_LPIPS_PLAN) - 1:
                h = TF.max_pool2d(h, 2, 2)
        return taps

    fa, fb = feats(a), feats(b)
    total = 0.0
    for i, (xa, xb) in enumerate(zip(fa, fb)):
        na = xa / xa.norm(dim=1, keepdim=True).clamp_min(1e-10)
        nb = xb / xb.norm(dim=1, keepdim=True).clamp_min(1e-10)
        diff = (na - nb).square()
        lin = torch.tensor(weights[f"lin{i}_w"]).view(1, -1, 1, 1)
        total = total + (diff * lin).sum(dim=1, keepdim=True).mean()
    return float(total)


def test_lpips_matches_torch(rng, tmp_path, monkeypatch):
    weights = _make_tiny_lpips(rng)
    wdir = tmp_path / "weights"
    wdir.mkdir()
    np.savez(wdir / "lpips_vgg.npz", **weights)
    monkeypatch.setenv("workspace", str(tmp_path))

    from gdb_nerf_tpu.eval.lpips import LPIPS

    metric = LPIPS.load_default()
    a = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    b = rng.uniform(-1, 1, (32, 32, 3)).astype(np.float32)
    ours = metric(a, b)
    ref = _torch_lpips(
        weights,
        torch.tensor(a).permute(2, 0, 1)[None],
        torch.tensor(b).permute(2, 0, 1)[None],
    )
    np.testing.assert_allclose(ours, ref, rtol=1e-4, atol=1e-5)


def test_lpips_absent_raises(tmp_path, monkeypatch):
    monkeypatch.setenv("workspace", str(tmp_path))
    from gdb_nerf_tpu.eval.lpips import LPIPS

    with pytest.raises(FileNotFoundError):
        LPIPS.load_default()
