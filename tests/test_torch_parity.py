"""Numerical parity: torch modules -> converted weights -> flax modules.

Builds torch modules with the reference's architecture (conv/BN layouts,
FPN merge order, U-Net skips, MLP heads), converts their state dicts with
tools/convert_checkpoint.py mappings, loads them into our flax modules, and
checks outputs agree on random inputs.  This is the machinery that makes
the released reference checkpoint loadable at parity.
"""

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

import sys, os
sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_checkpoint import Converter, conv2d, convert  # noqa: E402


def cbn2d(i, o, k, s=1, p=0):
    return nn.Sequential(
        nn.Conv2d(i, o, k, s, p, bias=False), nn.BatchNorm2d(o), nn.ReLU()
    )


def cbn3d(i, o, k, s=1, p=0):
    return nn.Sequential(
        nn.Conv3d(i, o, k, s, p, bias=False), nn.BatchNorm3d(o), nn.ReLU()
    )


def dbn3d(i, o):
    return nn.Sequential(
        nn.ConvTranspose3d(i, o, 3, 2, 1, output_padding=1, bias=False),
        nn.BatchNorm3d(o),
        nn.ReLU(),
    )


class TorchFPN(nn.Module):
    """Reference FeatureNet architecture (feature_net.py:17-64)."""

    def __init__(self, bc=8, out=(32, 16, 8)):
        super().__init__()
        self.conv0 = nn.Sequential(cbn2d(3, bc, 3, 1, 1), cbn2d(bc, bc, 3, 1, 1))
        self.conv1 = nn.Sequential(
            cbn2d(bc, bc * 2, 5, 2, 2), cbn2d(bc * 2, bc * 2, 3, 1, 1)
        )
        self.conv2 = nn.Sequential(
            cbn2d(bc * 2, bc * 4, 5, 2, 2), cbn2d(bc * 4, bc * 4, 3, 1, 1)
        )
        self.out0 = nn.Conv2d(bc * 4, out[0], 1)
        self.inner1 = nn.Conv2d(bc * 2, bc * 4, 1)
        self.inner2 = nn.Conv2d(bc, bc * 4, 1)
        self.out1 = nn.Conv2d(bc * 4, out[1], 3, padding=1, bias=False)
        self.out2 = nn.Conv2d(bc * 4, out[2], 3, padding=1, bias=False)

    def forward(self, x):
        c0 = self.conv0(x)
        c1 = self.conv1(c0)
        c2 = self.conv2(c1)
        feats = [self.out0(c2)]
        intra = TF.interpolate(c2, size=c1.shape[-2:], mode="nearest") + self.inner1(c1)
        feats.append(self.out1(intra))
        intra = TF.interpolate(intra, size=c0.shape[-2:], mode="nearest") + self.inner2(
            c0
        )
        feats.append(self.out2(intra))
        return feats


def _convert_prefixed(sd, prefix, **kw):
    sd = {f"{prefix}.{k}": v.numpy() for k, v in sd.items()}
    # Fill the other top-level modules with nothing; convert() tolerates only
    # full trees, so build manually through Converter helpers instead.
    return sd


def test_feature_net_parity(rng):
    torch.manual_seed(0)
    tmod = TorchFPN().eval()
    x = rng.standard_normal((2, 3, 32, 48)).astype(np.float32)
    with torch.no_grad():
        ref = [t.numpy() for t in tmod(torch.from_numpy(x))]

    sd = {f"feature_net.{k}": v.numpy() for k, v in tmod.state_dict().items()}
    c = Converter(sd)
    i = 0
    for blk in ("conv0.0", "conv0.1", "conv1.0", "conv1.1", "conv2.0", "conv2.1"):
        c.conv_block(f"feature_net.{blk}", f"feature_net/ConvBlock_{i}", False)
        i += 1
    c.conv("feature_net.out0", "feature_net/Conv_0")
    c.conv("feature_net.inner1", "feature_net/Conv_1")
    c.conv("feature_net.out1", "feature_net/Conv_2", bias=False)
    c.conv("feature_net.inner2", "feature_net/Conv_3")
    c.conv("feature_net.out2", "feature_net/Conv_4", bias=False)

    from gdb_nerf_tpu.models.feature_net import FeatureNet

    net = FeatureNet()
    variables = {
        "params": c.params["feature_net"],
        "batch_stats": c.stats["feature_net"],
    }
    ours = net.apply(variables, jnp.asarray(x.transpose(0, 2, 3, 1)), train=False)
    for a, b in zip(ours, ref):
        np.testing.assert_allclose(
            np.asarray(a), b.transpose(0, 2, 3, 1), rtol=1e-3, atol=1e-4
        )


class TorchCostRegSmall(nn.Module):
    """Reference CostRegNet_small (cost_reg_net.py:68-118)."""

    def __init__(self, ic, oc, bc):
        super().__init__()
        self.conv0 = cbn3d(ic, bc, 3, 1, 1)
        self.conv1 = cbn3d(bc, bc * 2, 3, 2, 1)
        self.conv2 = cbn3d(bc * 2, bc * 2, 3, 1, 1)
        self.conv3 = cbn3d(bc * 2, bc * 4, 3, 2, 1)
        self.conv4 = cbn3d(bc * 4, bc * 4, 3, 1, 1)
        self.conv5 = dbn3d(bc * 4, bc * 2)
        self.conv6 = dbn3d(bc * 2, bc)
        self.feat_head = nn.Conv3d(bc, oc, 3, padding=1, bias=False)
        self.prob_head = nn.Conv3d(bc, 1, 3, padding=1, bias=False)

    def forward(self, x):
        c0 = self.conv0(x)
        c2 = self.conv2(self.conv1(c0))
        x = self.conv4(self.conv3(c2))
        x = c2 + self.conv5(x)
        x = c0 + self.conv6(x)
        return self.feat_head(x), torch.softmax(self.prob_head(x).squeeze(1), dim=1)


def test_cost_reg_small_parity(rng):
    torch.manual_seed(1)
    tmod = TorchCostRegSmall(16, 8, 8).eval()
    x = rng.standard_normal((1, 16, 8, 8, 8)).astype(np.float32)
    with torch.no_grad():
        feat_t, prob_t = tmod(torch.from_numpy(x))

    sd = {f"m.{k}": v.numpy() for k, v in tmod.state_dict().items()}
    c = Converter(sd)
    for i, name in enumerate(["conv0", "conv1", "conv2", "conv3", "conv4"]):
        c.conv_block(f"m.{name}", f"m/ConvBlock_{i}", three_d=True)
    for i, name in enumerate(["conv5", "conv6"]):
        c.deconv_block(f"m.{name}", f"m/DeconvBlock_{i}")
    c.conv("m.feat_head", "m/Conv_0", three_d=True, bias=False)
    c.conv("m.prob_head", "m/Conv_1", three_d=True, bias=False)

    from gdb_nerf_tpu.models.cost_reg_net import CostRegNetSmall

    net = CostRegNetSmall(out_channels=8, base_channels=8)
    variables = {"params": c.params["m"], "batch_stats": c.stats["m"]}
    feat, prob = net.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False
    )
    np.testing.assert_allclose(
        np.asarray(feat),
        feat_t.numpy().transpose(0, 2, 3, 4, 1),
        rtol=1e-3,
        atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(prob), prob_t.numpy(), rtol=1e-3, atol=1e-5
    )


class TorchBundleNeRF(nn.Module):
    """Reference bundle NeRF head (nerf.py:6-115)."""

    def __init__(self, hid=64, feat_dim=8, voxel_dim=8):
        super().__init__()
        self.feat_dim = feat_dim
        self.view_fc = nn.Sequential(nn.Linear(4, feat_dim + 3), nn.ReLU())
        self.global_fc = nn.Sequential(nn.Linear((feat_dim + 3) * 3, 32), nn.ReLU())
        self.agg_w_fc = nn.Sequential(nn.Linear(32, 1), nn.ReLU())
        self.fc = nn.Sequential(nn.Linear(32, 16), nn.ReLU())
        self.lr0 = nn.Sequential(nn.Linear(voxel_dim + 16, hid), nn.ReLU())
        self.sigma = nn.Sequential(nn.Linear(hid, 1), nn.Softplus())
        self.weight = nn.Sequential(
            nn.Linear(hid + voxel_dim + 16 + feat_dim + 3 + 4, hid),
            nn.ReLU(),
            nn.Linear(hid, 1),
            nn.ReLU(),
        )
        self.feat_head = nn.Sequential(nn.Linear(hid, voxel_dim), nn.ReLU())

    def forward(self, vox, payload_dir):
        # payload_dir: (V, N, P + feat_dim+3+4); the last feat+3+4 is frd.
        frd = payload_dir[..., -(self.feat_dim + 3 + 4):]
        img_feat_rgb = frd[..., :-4] + self.view_fc(frd[..., -4:])
        var, avg = torch.var_mean(img_feat_rgb, dim=0, keepdim=True)
        V = frd.shape[0]
        feat = torch.cat(
            [img_feat_rgb, var.expand(V, -1, -1), avg.expand(V, -1, -1)], dim=-1
        )
        gfeat = self.global_fc(feat)
        w = torch.softmax(self.agg_w_fc(gfeat), dim=0)
        im_feat = self.fc((gfeat * w).sum(0))
        vox_img = torch.cat([vox, im_feat], dim=-1)
        x = self.lr0(vox_img)
        sigma = self.sigma(x).squeeze(-1)
        wf = torch.cat([x, vox_img], dim=-1)[None].expand(V, -1, -1)
        wf = torch.cat([wf, frd], dim=-1)
        bw = torch.softmax(self.weight(wf), dim=0)
        blended = (payload_dir[..., :-4] * bw).sum(0)
        return sigma, torch.cat([blended, self.feat_head(x)], dim=-1)


def test_bundle_nerf_parity(rng):
    torch.manual_seed(2)
    feat_dim, voxel_dim, V, N = 8, 8, 3, 50
    tmod = TorchBundleNeRF(64, feat_dim, voxel_dim).eval()
    vox = rng.standard_normal((N, voxel_dim)).astype(np.float32)
    P = 12  # member-ray rgbs
    payload_extra = rng.standard_normal((V, N, P)).astype(np.float32)
    frd = rng.standard_normal((V, N, feat_dim + 3 + 4)).astype(np.float32)
    payload_dir = np.concatenate([payload_extra, frd], axis=-1)
    with torch.no_grad():
        sigma_t, feat_t = tmod(
            torch.from_numpy(vox), torch.from_numpy(payload_dir)
        )

    sd = {f"nerf.{k}": v.numpy() for k, v in tmod.state_dict().items()}
    c = Converter(sd)
    F = feat_dim + 3
    c.dense("nerf.view_fc.0", "nerf/agg/view_fc")
    c.dense_split("nerf.global_fc.0", [
        ("nerf/agg/global_fc_pv", F, False),
        ("nerf/agg/global_fc_var", F, False),
        ("nerf/agg/global_fc_mean", F, True),
    ])
    c.dense("nerf.agg_w_fc.0", "nerf/agg/agg_w_fc")
    c.dense("nerf.fc.0", "nerf/agg/fc")
    c.dense("nerf.lr0.0", "nerf/lr0")
    c.dense("nerf.sigma.0", "nerf/sigma")
    c.dense_split("nerf.weight.0", [
        ("nerf/weight0_shared", 64 + voxel_dim + 16, True),
        ("nerf/weight0_view", F + 4, False),
    ])
    c.dense("nerf.weight.2", "nerf/weight1")
    c.dense("nerf.feat_head.0", "nerf/feat_head")

    from gdb_nerf_tpu.models.nerf_head import BundleNeRF

    net = BundleNeRF(hid_dim=64, voxel_dim=voxel_dim)
    variables = {"params": c.params["nerf"]}
    # ours: batch leading, view axis second: payload (1, V, N, P+F),
    # frd (1, V, N, F+4), vox (1, N, vox).
    payload_ours = np.concatenate([payload_extra, frd[..., :-4]], axis=-1)
    sigma, feat = net.apply(
        variables,
        jnp.asarray(vox)[None],
        jnp.asarray(payload_ours)[None],
        jnp.asarray(frd)[None],
    )
    np.testing.assert_allclose(
        np.asarray(sigma)[0], sigma_t.numpy(), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(feat)[0], feat_t.numpy(), rtol=1e-3, atol=1e-4
    )
