"""End-to-end checkpoint parity: full torch Network -> convert() -> our Network.

This is the keystone converter test: it builds a torch replica of the FULL
reference network (architecture per /root/reference/networks/gdb_nerf/*,
cited per class; code written fresh), runs its composed eval forward on a
synthetic multi-view batch, pushes its state_dict through the real
tools/convert_checkpoint.convert(), loads the result into our flax Network,
and asserts the rendered images/depths agree.  It also asserts the converted
variable tree covers our init tree *exactly* (every parameter mapped, none
missing), so any module rename breaks loudly.

The nvdiffrast mip texture and nerfacc compositing calls of the reference
are replaced in the replica by their documented semantics (2x2 box pyramid +
fractional-LOD trilinear with clamp boundaries; exclusive-cumprod
transmittance + per-bundle L1 weight normalization) — the same semantics our
ops are unit-tested against (tests/test_mip.py, tests/test_render.py).

Module-level parity for the pieces the composed eval pass can't reach
(training-only StageNeRF) or reaches only shallowly (full CostRegNet) is
covered by dedicated tests below.
"""

import math
import os
import sys

import numpy as np
import pytest
import torch
import torch.nn as nn
import torch.nn.functional as TF

import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from convert_checkpoint import convert  # noqa: E402


# ---------------------------------------------------------------------------
# torch building blocks (modules.py:5-57)
# ---------------------------------------------------------------------------


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


class TorchFeatureNet(nn.Module):
    """Reference FeatureNet (feature_net.py:8-64)."""

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
        intra = TF.interpolate(intra, size=c0.shape[-2:], mode="nearest") + self.inner2(c0)
        feats.append(self.out2(intra))
        return feats


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


class TorchCostRegFull(nn.Module):
    """Reference CostRegNet, 3-down/3-up (cost_reg_net.py:8-65)."""

    def __init__(self, ic, oc, bc):
        super().__init__()
        self.conv0 = cbn3d(ic, bc, 3, 1, 1)
        self.conv1 = cbn3d(bc, bc * 2, 3, 2, 1)
        self.conv2 = cbn3d(bc * 2, bc * 2, 3, 1, 1)
        self.conv3 = cbn3d(bc * 2, bc * 4, 3, 2, 1)
        self.conv4 = cbn3d(bc * 4, bc * 4, 3, 1, 1)
        self.conv5 = cbn3d(bc * 4, bc * 8, 3, 2, 1)
        self.conv6 = cbn3d(bc * 8, bc * 8, 3, 1, 1)
        self.conv7 = dbn3d(bc * 8, bc * 4)
        self.conv8 = dbn3d(bc * 4, bc * 2)
        self.conv9 = dbn3d(bc * 2, bc)
        self.feat_head = nn.Conv3d(bc, oc, 3, padding=1, bias=False)
        self.prob_head = nn.Conv3d(bc, 1, 3, padding=1, bias=False)

    def forward(self, x):
        c0 = self.conv0(x)
        c2 = self.conv2(self.conv1(c0))
        c4 = self.conv4(self.conv3(c2))
        x = self.conv6(self.conv5(c4))
        x = c4 + self.conv7(x)
        x = c2 + self.conv8(x)
        x = c0 + self.conv9(x)
        return self.feat_head(x), torch.softmax(self.prob_head(x).squeeze(1), dim=1)


class TorchStageNeRF(nn.Module):
    """Reference DepthNet-internal NeRF (depth_net.py:201-298)."""

    def __init__(self, hid=64, voxel_dim=8, feat_dim=32):
        super().__init__()
        F = feat_dim + 3
        self.view_fc = nn.Sequential(nn.Linear(4, F), nn.ReLU())
        self.global_fc = nn.Sequential(nn.Linear(F * 3, 32), nn.ReLU())
        self.agg_w_fc = nn.Sequential(nn.Linear(32, 1), nn.ReLU())
        self.fc = nn.Sequential(nn.Linear(32, 16), nn.ReLU())
        self.lr0 = nn.Sequential(nn.Linear(voxel_dim + 16, hid), nn.ReLU())
        self.sigma = nn.Sequential(nn.Linear(hid, 1), nn.Softplus())
        self.color = nn.Sequential(
            nn.Linear(hid + voxel_dim + 16 + F + 4, hid),
            nn.ReLU(),
            nn.Linear(hid, 1),
            nn.ReLU(),
        )

    def forward(self, vox_feat, img_feat_rgb_dir):
        # vox: (B, N, vox); img_feat_rgb_dir: (B, N, V, F+4).
        V = img_feat_rgb_dir.shape[-2]
        img_feat_rgb = img_feat_rgb_dir[..., :-4]
        img_feat_rgb = img_feat_rgb + self.view_fc(img_feat_rgb_dir[..., -4:])
        var, avg = torch.var_mean(img_feat_rgb, dim=-2, keepdim=True)
        feat = torch.cat(
            [img_feat_rgb, var.expand(-1, -1, V, -1), avg.expand(-1, -1, V, -1)],
            dim=-1,
        )
        gfeat = self.global_fc(feat)
        w = torch.softmax(self.agg_w_fc(gfeat), dim=-2)
        im_feat = self.fc((gfeat * w).sum(-2))
        vox_img = torch.cat([vox_feat, im_feat], dim=-1)
        x = self.lr0(vox_img)
        sigma = self.sigma(x).squeeze(-1)
        cf = torch.cat([x, vox_img], dim=-1)[..., None, :].expand(-1, -1, V, -1)
        cf = torch.cat([cf, img_feat_rgb_dir], dim=-1)
        cw = torch.softmax(self.color(cf), dim=-2)
        rgb = torch.sum(img_feat_rgb_dir[..., -7:-4] * cw, dim=-2)
        return sigma, rgb


class TorchBundleNeRF(nn.Module):
    """Reference bundle NeRF head (nerf.py:6-115)."""

    def __init__(self, hid=64, feat_dim=16, voxel_dim=8):
        super().__init__()
        self.feat_dim = feat_dim
        F = feat_dim + 3
        self.view_fc = nn.Sequential(nn.Linear(4, F), nn.ReLU())
        self.global_fc = nn.Sequential(nn.Linear(F * 3, 32), nn.ReLU())
        self.agg_w_fc = nn.Sequential(nn.Linear(32, 1), nn.ReLU())
        self.fc = nn.Sequential(nn.Linear(32, 16), nn.ReLU())
        self.lr0 = nn.Sequential(nn.Linear(voxel_dim + 16, hid), nn.ReLU())
        self.sigma = nn.Sequential(nn.Linear(hid, 1), nn.Softplus())
        self.weight = nn.Sequential(
            nn.Linear(hid + voxel_dim + 16 + F + 4, hid),
            nn.ReLU(),
            nn.Linear(hid, 1),
            nn.ReLU(),
        )
        self.feat_head = nn.Sequential(nn.Linear(hid, voxel_dim), nn.ReLU())

    def forward(self, vox, rgbs_feat_rgb_dir):
        # vox: (N, vox); rgbs_feat_rgb_dir: (V, N, 3b^2 + F + 4).
        V = rgbs_feat_rgb_dir.shape[0]
        frd = rgbs_feat_rgb_dir[..., -(self.feat_dim + 3 + 4):]
        img_feat_rgb = frd[..., :-4] + self.view_fc(frd[..., -4:])
        var, avg = torch.var_mean(img_feat_rgb, dim=0, keepdim=True)
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
        blended = (rgbs_feat_rgb_dir[..., :-4] * bw).sum(0)
        return sigma, torch.cat([blended, self.feat_head(x)], dim=-1)


class TorchSEBlock(nn.Module):
    """Reference SEBlock2D (decoder_rdn.py:7-22)."""

    def __init__(self, channels, reduction=16):
        super().__init__()
        self.fc = nn.Sequential(
            nn.Linear(channels, channels // reduction, bias=False),
            nn.ReLU(),
            nn.Linear(channels // reduction, channels, bias=False),
            nn.Sigmoid(),
        )

    def forward(self, x):
        b, c = x.shape[:2]
        y = x.mean(dim=(2, 3))
        return x * self.fc(y).view(b, c, 1, 1)


class TorchRDB(nn.Module):
    """Reference ResidualDenseBlock (decoder_rdn.py:25-41)."""

    def __init__(self, nf, growth=32):
        super().__init__()
        self.conv1 = nn.Conv2d(nf, growth, 3, padding=1, bias=False)
        self.conv2 = nn.Conv2d(nf + growth, growth, 3, padding=1, bias=False)
        self.conv3 = nn.Conv2d(nf + 2 * growth, nf, 3, padding=1, bias=False)
        self.se = TorchSEBlock(nf)

    def forward(self, x):
        x1 = TF.relu(self.conv1(x))
        x2 = TF.relu(self.conv2(torch.cat([x, x1], dim=1)))
        x3 = self.conv3(torch.cat([x, x1, x2], dim=1))
        return x + self.se(x3)


class TorchDecoder(nn.Module):
    """Reference Decoder (decoder_rdn.py:44-81)."""

    def __init__(self, ic, oc, nf, num_layers, upscale):
        super().__init__()
        self.in_conv = nn.Conv2d(ic, nf, 3, padding=1)
        self.blocks = nn.Sequential(*[TorchRDB(nf) for _ in range(num_layers)])
        ups = []
        for _ in range(int(round(math.log2(upscale)))):
            ups += [nn.Conv2d(nf, 4 * nf, 3, padding=1), nn.PixelShuffle(2)]
        self.up = nn.Sequential(*ups)
        self.out_conv = nn.Conv2d(nf, oc, 1)

    def forward(self, x):
        s = self.in_conv(x)
        x = s + self.blocks(s)
        return self.out_conv(self.up(x))


# ---------------------------------------------------------------------------
# torch functional pieces of the depth cascade (depth_net.py:399-514)
# ---------------------------------------------------------------------------


def t_get_depth_values(near_far, num_depth, inv):
    near, far = near_far[:, :1], near_far[:, -1:]
    if inv:
        near, far = 1.0 / near, 1.0 / far
    steps = torch.linspace(0.0, 1.0, num_depth).view(1, num_depth, 1, 1)
    return near + (far - near) * steps


def t_build_feature_volume(src_feat, src_exts, src_ints, tar_ext, tar_int,
                           depth_values, inv):
    B, V, C, Hs, Ws = src_feat.shape
    D, Ht, Wt = depth_values.shape[1:]
    if inv:
        depth_values = 1.0 / depth_values
    src_projs = torch.matmul(src_ints, src_exts[..., :3, :])
    tar_proj = torch.matmul(tar_int, tar_ext[..., :3, :])
    tar_proj = TF.pad(tar_proj, (0, 0, 0, 1), value=0.0)
    tar_proj[..., 3, 3] = 1.0
    projs = torch.matmul(src_projs, torch.inverse(tar_proj).unsqueeze(1)).view(-1, 3, 4)

    x, y = torch.meshgrid(
        torch.arange(Wt, dtype=torch.float32) + 0.5,
        torch.arange(Ht, dtype=torch.float32) + 0.5,
        indexing="xy",
    )
    pix = torch.stack([x, y, torch.ones_like(x)], dim=0).reshape(1, 3, Ht * Wt)
    dv = depth_values.view(B, 1, D, -1).expand(-1, V, -1, -1).reshape(B * V, 1, D, -1)
    xyz = torch.matmul(projs[..., :3], pix).unsqueeze(2) * dv + projs[..., 3:, None]
    xyz = xyz.permute(0, 2, 3, 1).contiguous()
    grid = xyz[..., :2] / xyz[..., 2:3].clamp_min(1e-6)
    grid[..., 0] = 2 * grid[..., 0] / Ws - 1
    grid[..., 1] = 2 * grid[..., 1] / Hs - 1
    warped = TF.grid_sample(
        src_feat.flatten(0, 1), grid, mode="bilinear", padding_mode="zeros",
        align_corners=False,
    )
    warped = warped.view(B, V, C, D, Ht, Wt)
    return torch.var(warped, dim=1, unbiased=False)


def t_depth_regression(depth_values, depth_prob, ci_scale, inv):
    depth = torch.sum(depth_prob * depth_values, dim=1, keepdim=True)
    var = torch.sum(depth_prob * (depth_values - depth).square(), dim=1, keepdim=True)
    half = ci_scale * torch.clamp_min(var, 1e-12).sqrt()
    if inv:
        ci = 1.0 / torch.cat(
            [torch.min(depth + half, depth_values[:, :1]),
             torch.max(depth - half, depth_values[:, -1:])], dim=1)
        depth = 1.0 / depth
    else:
        ci = torch.cat(
            [torch.max(depth - half, depth_values[:, :1]),
             torch.min(depth + half, depth_values[:, -1:])], dim=1)
    return depth, ci


class TorchDepthNet(nn.Module):
    """Reference DepthNet cascade, eval path (depth_net.py:10-198)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.cost_regs = nn.ModuleList([
            TorchCostRegSmall(cfg["fpn_dims"][cfg["vol_levels"][0]],
                              cfg["voxel_dim"], cfg["fpn_base"])
        ])
        for i in range(1, len(cfg["vol_levels"])):
            self.cost_regs.append(
                TorchCostRegFull(cfg["fpn_dims"][cfg["vol_levels"][i]],
                                 cfg["voxel_dim"], cfg["fpn_base"])
            )
        self.nerfs = nn.ModuleList([
            TorchStageNeRF(cfg["hid"], cfg["voxel_dim"],
                           cfg["fpn_dims"][cfg["vol_levels"][i]])
            for i in range(len(cfg["vol_levels"]) - 1)
        ])

    def forward(self, src_images, ms_feats, src_exts, src_ints, tar_exts,
                tar_ints, near_far):
        cfg = self.cfg
        B, V = src_images.shape[:2]
        H_ori, W_ori = src_images.shape[-2:]
        num_stages = len(cfg["vol_levels"])
        feat_scales = [cfg["fpn_scales"][l] for l in cfg["vol_levels"]]

        depths, cis, vols, volumes = [], [], [], []
        depth_range = near_far[..., None, None]
        for idx in range(num_stages):
            feats = ms_feats[cfg["vol_levels"][idx]]
            sis = src_ints.clone()
            sis[..., :2, :] *= feat_scales[idx]
            tis = tar_ints.clone()
            tis[:, :2, :] *= cfg["vol_scales"][idx]
            Hi = int(H_ori * cfg["vol_scales"][idx])
            Wi = int(W_ori * cfg["vol_scales"][idx])
            inv = cfg["inv_depth"][idx]
            dv = t_get_depth_values(depth_range, cfg["num_depth"][idx], inv)
            dv = dv.expand(-1, -1, Hi, Wi)
            vol = t_build_feature_volume(feats, src_exts, sis, tar_exts, tis, dv, inv)
            feat_volume, prob = self.cost_regs[idx](vol)
            depth, ci = t_depth_regression(dv, prob, cfg["ci_scales"][idx], inv)
            depth_range = ci
            depths.append(depth.squeeze(1))
            cis.append(ci)
            vols.append(dv[:, [0, -1]])
            volumes.append(feat_volume)
            if idx < num_stages - 1:
                up = cfg["vol_scales"][idx + 1] / cfg["vol_scales"][idx]
                depth_range = TF.interpolate(
                    depth_range, scale_factor=up, mode="bilinear",
                    align_corners=False,
                )
        return depths, cis, vols, volumes


# ---------------------------------------------------------------------------
# torch bundle sampler (bundle_sampler.py:8-371), nvdiffrast replaced by its
# documented semantics (2x2 box pyramid + fractional-LOD trilinear, clamp)
# ---------------------------------------------------------------------------


def t_mip_fetch(levels, uv01, lod, max_level):
    """levels: [(V, Hl, Wl, C)]; uv01: (V, N, 2) in [0,1]; lod: (V, N)."""
    lod = lod.clamp(0.0, float(max_level))
    l0 = torch.floor(lod).long()
    frac = (lod - l0.float())[..., None]
    l1 = torch.minimum(l0 + 1, torch.tensor(max_level))

    def tap(level_idx):
        out = torch.zeros(uv01.shape[0], uv01.shape[1], levels[0].shape[-1])
        for l, tex in enumerate(levels):
            sel = level_idx == l
            if not sel.any():
                continue
            V, Hl, Wl, C = tex.shape
            for v in range(V):
                m = sel[v]
                if not m.any():
                    continue
                x = (uv01[v, m, 0] * Wl - 0.5).clamp(0.0, Wl - 1.0)
                y = (uv01[v, m, 1] * Hl - 0.5).clamp(0.0, Hl - 1.0)
                x0 = x.floor().long().clamp(0, Wl - 1)
                y0 = y.floor().long().clamp(0, Hl - 1)
                x1 = (x0 + 1).clamp(max=Wl - 1)
                y1 = (y0 + 1).clamp(max=Hl - 1)
                wx = (x - x0.float())[:, None]
                wy = (y - y0.float())[:, None]
                t = tex[v]
                top = t[y0, x0] * (1 - wx) + t[y0, x1] * wx
                bot = t[y1, x0] * (1 - wx) + t[y1, x1] * wx
                out[v, m] = top * (1 - wy) + bot * wy
        return out

    return tap(l0) * (1 - frac) + tap(l1) * frac


class TorchBundleSampler:
    """Reference BundleSampler, fixed + adaptive paths."""

    def __init__(self, global_num_depth, max_mip):
        self.gnd = global_num_depth
        self.max_mip = max_mip

    def build_rays(self, tar_exts, tar_ints, im_size, near, far):
        self.H_orig, self.W_orig = im_size
        self.near, self.far = near, far
        x, y = torch.meshgrid(
            torch.arange(self.W_orig, dtype=torch.float32) + 0.5,
            torch.arange(self.H_orig, dtype=torch.float32) + 0.5,
            indexing="xy",
        )
        self.uv = torch.stack(
            (2 * x / self.W_orig - 1, 2 * y / self.H_orig - 1), dim=-1
        )
        xyz = torch.stack((x.flatten(), y.flatten(), torch.ones(x.numel())), dim=1)
        c2w = torch.inverse(tar_exts)
        self.z_axis = c2w[:, :3, 2]
        self.rays_o = c2w[:, :3, 3]
        rays_d = torch.matmul(
            xyz, torch.matmul(c2w[:, :3, :3], torch.inverse(tar_ints)).transpose(-2, -1)
        )
        self.rays_d = rays_d.view(-1, self.H_orig, self.W_orig, 3)
        self.tar_pixel_radius = 1.0 / torch.sqrt(
            tar_ints[:, 0, 0] * tar_ints[:, 1, 1] * torch.pi
        )

    def sample(self, depth_range, vol_range, b, S, inv, adaptive):
        B, _, H, W = depth_range.shape
        if inv:
            depth_range = 1.0 / depth_range
            vol_range = 1.0 / vol_range
            min_si = (1.0 / self.near - 1.0 / self.far) / self.gnd
        else:
            min_si = (self.far - self.near) / self.gnd

        rays_d = self.rays_d.view(B, H, b, W, b, 3)
        bundle_d = rays_d.mean(dim=(2, 4))
        rays_d = rays_d.permute(0, 1, 3, 5, 2, 4).reshape(B, H, W, 3 * b * b)
        cos = torch.sum(
            bundle_d * self.z_axis[:, None, None], dim=-1
        ) / torch.linalg.vector_norm(bundle_d, dim=-1)
        uv = self.uv.view(H, b, W, b, 2).mean(dim=(1, 3))[None].expand(B, -1, -1, -1)
        disk = (b * self.tar_pixel_radius).view(B, 1, 1).expand(-1, H, W)

        bn = depth_range[:, 0].reshape(-1, 1)
        bf = depth_range[:, 1].reshape(-1, 1)
        N = bn.shape[0]
        if adaptive:
            msi = min_si[:, None].expand(-1, H * W).reshape(-1, 1)
            spb = torch.ceil((bf - bn).abs() / msi).clamp(1, S)
        else:
            spb = torch.full((N, 1), float(S))
        idx = torch.arange(S + 1, dtype=torch.float32)[None]
        t_vals = bn + (bf - bn) / spb * idx
        valid = idx[:, :-1] < spb  # (N, S)
        t_starts = t_vals[:, :-1][valid]
        t_ends = t_vals[:, 1:][valid]
        indices = (
            torch.arange(N)[:, None].expand(-1, S)[valid]
        )
        z = 0.5 * (t_starts + t_ends)
        vn = vol_range[:, 0].reshape(-1)[indices]
        vf = vol_range[:, 1].reshape(-1)[indices]
        d = 2 * (z - vn) / (vf - vn) - 1.0
        uvd = torch.cat([uv.reshape(-1, 2)[indices], d[:, None]], dim=-1)
        if inv:
            z = 1.0 / z
        rd = rays_d.reshape(N, 3, b * b)[indices]
        ro = self.rays_o[:, None, :].expand(-1, H * W, -1).reshape(-1, 3)[indices]
        rays_xyz = ro.unsqueeze(-1) + rd * z[:, None, None]
        bundle_xyz = rays_xyz.mean(dim=-1)
        distances = torch.linalg.vector_norm(bundle_xyz - ro, dim=-1)
        cosf = cos.reshape(-1)
        diskf = disk.reshape(-1)
        ball = diskf * cosf / torch.sqrt(
            (torch.sqrt((1.0 / cosf.square() - 1.0).clamp_min(1e-12)) - diskf).square()
            + 1.0
        )
        ball_radii = distances * ball[indices]
        samples_per_batch = valid.view(B, -1).sum(dim=(1,))
        return rays_xyz, uvd, z, ball_radii, indices, samples_per_batch, valid

    def encode(self, src_images, img_feat, feat_volume, rays_xyz, uvd,
               ball_radii, src_exts, src_ints, tar_exts, samples_per_batch):
        B, V, Fc, H, W = img_feat.shape
        N, _, bsq = rays_xyz.shape
        b = round(math.sqrt(bsq))
        tar_cam = torch.inverse(tar_exts)[:, None, :3, 3]
        src_cam = torch.inverse(src_exts)[..., :3, 3]
        bundle_xyz = rays_xyz.mean(dim=-1)
        sis = src_ints.clone()
        sis[..., :2, :] = sis[..., :2, :] / b
        src_pix_r = 1.0 / torch.sqrt(sis[:, :, 0, 0] * sis[:, :, 1, 1] * torch.pi)

        vox = torch.empty(N, feat_volume.shape[1])
        out = torch.empty(V, N, 3 * bsq + Fc + 4)
        start = 0
        for bi in range(B):
            n = int(samples_per_batch[bi])
            sl = slice(start, start + n)
            sub_uvd = uvd[None, sl, None, None]
            sv = TF.grid_sample(
                feat_volume[bi : bi + 1], sub_uvd, mode="bilinear",
                padding_mode="border", align_corners=False,
            )
            vox[sl] = sv.view(-1, n).permute(1, 0)

            rc = rays_xyz[sl].permute(0, 2, 1).reshape(1, -1, 3)
            rc = TF.pad(rc, (0, 1), value=1.0)
            rc = torch.matmul(rc, src_exts[bi].transpose(-2, -1))[..., :3]
            ri = torch.matmul(rc, src_ints[bi].transpose(-2, -1))
            grid = ri[..., :2] / ri[..., 2:3].clamp_min(1e-6)
            grid = torch.stack(
                [2 * grid[..., 0] / self.W_orig - 1.0,
                 2 * grid[..., 1] / self.H_orig - 1.0], dim=-1)
            rgbs = TF.grid_sample(
                src_images[bi], grid.unsqueeze(2), align_corners=False,
                mode="bilinear", padding_mode="border",
            )
            rgbs = rgbs.view(V, 3, -1, bsq).permute(0, 2, 1, 3).reshape(V, n, 3 * bsq)

            bc = rc.view(V, -1, bsq, 3).mean(dim=-2)
            dist = torch.linalg.vector_norm(bc, dim=-1, keepdim=True)
            sec_sq = (dist / bc[..., 2:3]).square()
            ratio = (dist / ball_radii[None, sl, None]).square() - 1.0
            proj_r = sec_sq / (
                torch.sqrt(ratio.clamp_min(1e-12))
                + torch.sqrt((sec_sq - 1.0).clamp_min(1e-12))
            )
            levels = torch.log2(proj_r / src_pix_r[bi, :, None, None])

            bimg = torch.matmul(bc, sis[bi].transpose(-2, -1))
            bgrid = bimg[..., :2] / bimg[..., 2:3].clamp_min(1e-6)
            bgrid = torch.stack([bgrid[..., 0] / W, bgrid[..., 1] / H], dim=-1)

            # mip pyramid of img_feat (channels-last)
            tex = img_feat[bi].permute(0, 2, 3, 1).contiguous()
            levels_list = [tex]
            cur = tex
            for _ in range(self.max_mip):
                Vv, Hl, Wl, C = cur.shape
                cur = cur.view(Vv, Hl // 2, 2, Wl // 2, 2, C).mean(dim=(2, 4))
                levels_list.append(cur)
            feat = t_mip_fetch(levels_list, bgrid, levels.squeeze(-1), self.max_mip)

            tar_diff = TF.normalize(bundle_xyz[sl] - tar_cam[bi], p=2.0, dim=-1)
            src_diff = TF.normalize(
                bundle_xyz[sl] - src_cam[bi].unsqueeze(1), p=2.0, dim=-1
            )
            rd_dir = TF.normalize(tar_diff - src_diff, p=2.0, dim=-1)
            rd_dot = torch.sum(tar_diff * src_diff, dim=-1, keepdim=True)
            out[:, sl] = torch.cat([rgbs, feat, torch.cat([rd_dir, rd_dot], -1)], -1)
            start += n
        return out, vox


class TorchNetwork(nn.Module):
    """Composed reference Network, eval forward (network.py:14-189)."""

    def __init__(self, cfg):
        super().__init__()
        self.cfg = cfg
        self.feature_net = TorchFeatureNet(cfg["fpn_base"], cfg["fpn_dims"])
        self.depth_net = TorchDepthNet(cfg)
        self.sampler = TorchBundleSampler(cfg["global_num_depth"], cfg["max_mip"])
        self.feat_level = 0
        while (self.feat_level < len(cfg["fpn_scales"])
               and cfg["fpn_scales"][self.feat_level] < 1.0 / cfg["bundle"]):
            self.feat_level += 1
        feat_dim = cfg["fpn_dims"][self.feat_level]
        self.nerf = TorchBundleNeRF(cfg["hid"], feat_dim, cfg["voxel_dim"])
        self.upsampler = TorchDecoder(
            feat_dim + 3 + cfg["voxel_dim"], 3, 64, cfg["dec_layers"], cfg["bundle"]
        )

    def forward(self, batch, is_adaptive):
        cfg = self.cfg
        b = cfg["bundle"]
        src = batch["src_views"]
        src_images = src["rgb"]
        B, V, _, H_orig, W_orig = src_images.shape
        src_exts, src_ints = src["extrinsics"], src["intrinsics"]
        tar_exts, tar_ints = batch["tar_views"]["extrinsics"], batch["tar_views"]["intrinsics"]
        near_far = batch["near_far"]
        inv = cfg["inv_depth"][-1]

        ms_feats = self.feature_net(src_images.flatten(0, 1))
        ms_feats = [f.unflatten(0, (B, V)) for f in ms_feats]

        depths, cis, vols, volumes = self.depth_net(
            src_images, ms_feats, src_exts, src_ints, tar_exts, tar_ints, near_far
        )
        depth_range, vol_range = cis[-1], vols[-1]
        feat_volume, mvs_depth = volumes[-1], depths[-1]

        self.sampler.build_rays(
            tar_exts, tar_ints, (H_orig, W_orig), near_far[:, 0], near_far[:, 1]
        )
        H, W = H_orig // b, W_orig // b
        if depth_range.shape[2:] != (H, W):
            depth_range = TF.interpolate(depth_range, size=(H, W), mode="bilinear",
                                         align_corners=False)
            vol_range = TF.interpolate(vol_range, size=(H, W), mode="bilinear",
                                       align_corners=False)
            mvs_depth = TF.interpolate(mvs_depth.unsqueeze(1), size=(H, W),
                                       mode="nearest").squeeze(1)

        rays_xyz, uvd, z_vals, ball_radii, indices, spb_batch, valid = \
            self.sampler.sample(depth_range, vol_range, b,
                                cfg["max_num_samples"], inv, is_adaptive)

        img_feat = ms_feats[self.feat_level]
        if img_feat.shape[-2:] != (H, W):
            img_feat = TF.interpolate(
                img_feat.flatten(0, 1), size=(H, W), mode="bilinear",
                align_corners=False,
            ).unflatten(0, (B, V))
        img_feat = torch.cat(
            [img_feat,
             TF.interpolate(src_images.flatten(0, 1), size=(H, W), mode="bilinear",
                            align_corners=False).unflatten(0, (B, V))],
            dim=2,
        )
        rgbs_feat_rgb_dir, vox_feat = self.sampler.encode(
            src_images, img_feat, feat_volume, rays_xyz, uvd, ball_radii,
            src_exts, src_ints, tar_exts, spb_batch,
        )

        sigma, feat = self.nerf(vox_feat, rgbs_feat_rgb_dir)
        # nerfacc semantics: exclusive-cumprod transmittance over ragged
        # bundles + per-bundle L1 weight normalization (utils.py:19-43).
        num_bundles = B * H * W
        alpha = 1.0 - torch.exp(-sigma)
        # dense (num_bundles, S) with invalid samples alpha=0
        S = cfg["max_num_samples"]
        alpha_d = torch.zeros(num_bundles, S)
        pos = torch.cumsum(valid.long(), dim=1) - 1  # slot of each valid sample
        alpha_d[indices, pos[valid]] = alpha
        trans = torch.cumprod(1.0 - alpha_d, dim=1)
        trans = torch.cat([torch.ones(num_bundles, 1), trans[:, :-1]], dim=1)
        w_d = alpha_d * trans
        wsum = w_d.sum(dim=1, keepdim=True).clamp_min(1e-6)
        w_d = w_d / wsum
        weights = w_d[indices, pos[valid]]

        zc = 1.0 / z_vals if inv else z_vals
        vals = torch.cat([feat, zc[:, None], torch.ones_like(zc[:, None])], dim=-1)
        acc = torch.zeros(num_bundles, vals.shape[-1])
        acc.index_add_(0, indices, vals * weights[:, None])
        bundle_feat, bundle_depth, bundle_op = acc[:, :-2], acc[:, -2], acc[:, -1]
        if inv:
            bundle_depth = 1.0 / bundle_depth

        nerf_feat = bundle_feat.view(B, H, W, -1).permute(0, 3, 1, 2)
        nerf_depth = bundle_depth.view(B, H, W)
        nerf_op = bundle_op.view(B, H, W)
        nrb = 3 * b * b
        rgb_c = self.upsampler(nerf_feat[:, nrb:])
        rgb_f = TF.pixel_shuffle(nerf_feat[:, :nrb], b)
        nerf_depth = TF.interpolate(nerf_depth.unsqueeze(1), scale_factor=b,
                                    mode="bilinear", align_corners=False).squeeze(1)
        nerf_op = TF.interpolate(nerf_op.unsqueeze(1), scale_factor=b,
                                 mode="bilinear", align_corners=False).squeeze(1)
        img = rgb_c + rgb_f
        return {"rgb": img, "nerf_depth": nerf_depth, "mvs_depth": mvs_depth,
                "opacity": nerf_op}


# ---------------------------------------------------------------------------
# the tests
# ---------------------------------------------------------------------------

CFG = dict(
    fpn_base=8, fpn_dims=(32, 16, 8), fpn_scales=(0.25, 0.5, 1.0),
    vol_levels=(0, 1), vol_scales=(0.125, 0.5), ci_scales=(1.0, 1.0),
    voxel_dim=8, num_depth=(16, 8), inv_depth=(True, False),
    bundle=2, global_num_depth=16, max_num_samples=4, max_mip=3, hid=64,
    dec_layers=2,
)


def _randomize_bn(module, rng):
    """Give BatchNorms non-trivial affine params + running stats so the
    converter's stat mapping is actually exercised."""
    for m in module.modules():
        if isinstance(m, (nn.BatchNorm2d, nn.BatchNorm3d)):
            m.weight.data = torch.tensor(
                rng.uniform(0.5, 1.5, m.weight.shape).astype(np.float32))
            m.bias.data = torch.tensor(
                rng.normal(0, 0.1, m.bias.shape).astype(np.float32))
            m.running_mean.data = torch.tensor(
                rng.normal(0, 0.1, m.running_mean.shape).astype(np.float32))
            m.running_var.data = torch.tensor(
                rng.uniform(0.5, 1.5, m.running_var.shape).astype(np.float32))


def _make_batch(rng, B=1, V=3, H=32, W=64):
    K = np.array(
        [[1.2 * W, 0, W / 2], [0, 1.2 * W, H / 2], [0, 0, 1]], np.float32
    )
    exts = []
    for v in range(V + 1):  # last = target
        ang = 0.12 * (v - V / 2.0)
        c, s = np.cos(ang), np.sin(ang)
        R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float32)
        t = np.array([0.25 * (v - V / 2.0), 0.05 * v, 0.1 * v], np.float32)
        E = np.eye(4, dtype=np.float32)
        E[:3, :3] = R
        E[:3, 3] = t
        exts.append(E)
    src_rgb = rng.uniform(size=(B, V, H, W, 3)).astype(np.float32)
    return {
        "src_views": {
            "rgb": src_rgb,
            "extrinsics": np.stack([np.stack(exts[:V])] * B),
            "intrinsics": np.stack([np.stack([K] * V)] * B),
        },
        "tar_views": {
            "extrinsics": np.stack([exts[V]] * B),
            "intrinsics": np.stack([K] * B),
        },
        "near_far": np.array([[2.0, 6.0]] * B, np.float32),
    }


def _tree_paths(tree, prefix=""):
    from collections.abc import Mapping

    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(_tree_paths(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


def _build_ours():
    from gdb_nerf_tpu.models.network import Network

    return Network(
        fpn_base_channels=CFG["fpn_base"],
        fpn_feat_dims=CFG["fpn_dims"],
        fpn_feat_scales=CFG["fpn_scales"],
        mvs_vol_levels=CFG["vol_levels"],
        mvs_vol_scales=CFG["vol_scales"],
        mvs_ci_scales=CFG["ci_scales"],
        mvs_voxel_dim=CFG["voxel_dim"],
        mvs_num_depth=CFG["num_depth"],
        mvs_inv_depth=CFG["inv_depth"],
        mvs_num_samples=(4,),
        bundle_size=CFG["bundle"],
        global_num_depth=CFG["global_num_depth"],
        max_num_samples=CFG["max_num_samples"],
        max_mipmap_level=CFG["max_mip"],
        nerf_hidden_dims=CFG["hid"],
        is_adaptive=False,  # overridden per-test via dataclasses.replace
        viewdir_agg=True,
        dec_layers=CFG["dec_layers"],
        reweighting=False,
    )


@pytest.mark.parametrize("is_adaptive", [False, True])
def test_full_network_parity(rng, is_adaptive):
    torch.manual_seed(7)
    tnet = TorchNetwork(CFG).eval()
    _randomize_bn(tnet, rng)

    batch = _make_batch(rng)
    tbatch = {
        "src_views": {
            "rgb": torch.tensor(batch["src_views"]["rgb"]).permute(0, 1, 4, 2, 3),
            "extrinsics": torch.tensor(batch["src_views"]["extrinsics"]),
            "intrinsics": torch.tensor(batch["src_views"]["intrinsics"]),
        },
        "tar_views": {
            "extrinsics": torch.tensor(batch["tar_views"]["extrinsics"]),
            "intrinsics": torch.tensor(batch["tar_views"]["intrinsics"]),
        },
        "near_far": torch.tensor(batch["near_far"]),
    }
    with torch.no_grad():
        ret_t = tnet(tbatch, is_adaptive)

    # Convert the torch weights with the real converter.
    sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
    net_tree = convert(
        sd, num_stages=2, dec_layers=CFG["dec_layers"], stage_feat_dims=(32,),
        bundle_feat_dim=16, voxel_dim=CFG["voxel_dim"], hid_dim=CFG["hid"],
    )

    import dataclasses

    network = dataclasses.replace(_build_ours(), is_adaptive=is_adaptive)
    dev = {
        "src_views": {k: jnp.asarray(v) for k, v in batch["src_views"].items()},
        "tar_views": {k: jnp.asarray(v) for k, v in batch["tar_views"].items()},
        "near_far": jnp.asarray(batch["near_far"]),
    }
    variables = network.init(jax.random.PRNGKey(0), dev, train=True)

    # Converted tree must cover the init tree EXACTLY (shape-for-shape).
    init_paths = _tree_paths(variables["params"])
    conv_paths = _tree_paths(net_tree["params"])
    assert init_paths == conv_paths, (
        f"missing={sorted(set(init_paths) - set(conv_paths))[:10]} "
        f"extra={sorted(set(conv_paths) - set(init_paths))[:10]}"
    )
    init_stats = _tree_paths(variables["batch_stats"])
    conv_stats = _tree_paths(net_tree["batch_stats"])
    assert init_stats == conv_stats

    ret, mvs_depths, blend = network.apply(
        {"params": net_tree["params"], "batch_stats": net_tree["batch_stats"]},
        dev, train=False,
    )

    np.testing.assert_allclose(
        np.asarray(ret["mvs_depth"]), ret_t["mvs_depth"].numpy(),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(ret["rgb"]),
        ret_t["rgb"].numpy().transpose(0, 2, 3, 1),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(
        np.asarray(ret["nerf_depth"]), ret_t["nerf_depth"].numpy(),
        rtol=1e-3, atol=1e-3,
    )
    np.testing.assert_allclose(
        np.asarray(ret["opacity"]), ret_t["opacity"].numpy(),
        rtol=1e-3, atol=1e-4,
    )


def test_cost_reg_full_parity(rng):
    """Full 3-down CostRegNet module parity (cost_reg_net.py:8-65)."""
    torch.manual_seed(3)
    tmod = TorchCostRegFull(16, 8, 8).eval()
    _randomize_bn(tmod, rng)
    x = rng.standard_normal((1, 16, 8, 8, 16)).astype(np.float32)
    with torch.no_grad():
        feat_t, prob_t = tmod(torch.from_numpy(x))

    from convert_checkpoint import Converter

    sd = {f"m.{k}": v.numpy() for k, v in tmod.state_dict().items()}
    c = Converter(sd)
    for i, name in enumerate(["conv0", "conv1", "conv2", "conv3", "conv4",
                              "conv5", "conv6"]):
        c.conv_block(f"m.{name}", f"m/ConvBlock_{i}", three_d=True)
    for i, name in enumerate(["conv7", "conv8", "conv9"]):
        c.deconv_block(f"m.{name}", f"m/DeconvBlock_{i}")
    c.conv("m.feat_head", "m/Conv_0", three_d=True, bias=False)
    c.conv("m.prob_head", "m/Conv_1", three_d=True, bias=False)

    from gdb_nerf_tpu.models.cost_reg_net import CostRegNet

    net = CostRegNet(out_channels=8, base_channels=8)
    variables = {"params": c.params["m"], "batch_stats": c.stats["m"]}
    feat, prob = net.apply(
        variables, jnp.asarray(x.transpose(0, 2, 3, 4, 1)), train=False
    )
    np.testing.assert_allclose(
        np.asarray(feat), feat_t.numpy().transpose(0, 2, 3, 4, 1),
        rtol=1e-3, atol=1e-4,
    )
    np.testing.assert_allclose(np.asarray(prob), prob_t.numpy(), rtol=1e-3, atol=1e-5)


def test_stage_nerf_parity(rng):
    """Training-only stage NeRF module parity (depth_net.py:201-298)."""
    torch.manual_seed(4)
    feat_dim, voxel_dim, V, N = 32, 8, 3, 40
    tmod = TorchStageNeRF(64, voxel_dim, feat_dim).eval()
    vox = rng.standard_normal((1, N, voxel_dim)).astype(np.float32)
    ifrd = rng.standard_normal((1, N, V, feat_dim + 3 + 4)).astype(np.float32)
    with torch.no_grad():
        sigma_t, rgb_t = tmod(torch.from_numpy(vox), torch.from_numpy(ifrd))

    from convert_checkpoint import Converter

    sd = {f"depth_net.nerfs.0.{k}": v.numpy() for k, v in tmod.state_dict().items()}
    c = Converter(sd)
    F = feat_dim + 3
    t, j = "depth_net.nerfs.0", "depth_net/stage_nerf_0"
    c.dense(f"{t}.view_fc.0", f"{j}/agg/view_fc")
    c.dense_split(f"{t}.global_fc.0", [
        (f"{j}/agg/global_fc_pv", F, False),
        (f"{j}/agg/global_fc_var", F, False),
        (f"{j}/agg/global_fc_mean", F, True),
    ])
    c.dense(f"{t}.agg_w_fc.0", f"{j}/agg/agg_w_fc")
    c.dense(f"{t}.fc.0", f"{j}/agg/fc")
    c.dense(f"{t}.lr0.0", f"{j}/lr0")
    c.dense(f"{t}.sigma.0", f"{j}/sigma")
    c.dense_split(f"{t}.color.0", [
        (f"{j}/color0_shared", 64 + voxel_dim + 16, True),
        (f"{j}/color0_view", F + 4, False),
    ])
    c.dense(f"{t}.color.2", f"{j}/color1")

    from gdb_nerf_tpu.models.nerf_head import StageNeRF

    net = StageNeRF(hid_dim=64)
    variables = {"params": c.params["depth_net"]["stage_nerf_0"]}
    # ours takes the view axis right after batch: (B, V, N, F+4)
    sigma, rgb = net.apply(
        variables, jnp.asarray(vox), jnp.asarray(ifrd.transpose(0, 2, 1, 3))
    )
    np.testing.assert_allclose(
        np.asarray(sigma), sigma_t.numpy(), rtol=1e-3, atol=1e-5
    )
    np.testing.assert_allclose(np.asarray(rgb), rgb_t.numpy(), rtol=1e-3, atol=1e-5)
