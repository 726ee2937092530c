"""Convert a reference GDB-NeRF torch checkpoint (.pth) to our format.

Maps the reference's module tree (/root/reference/networks/gdb_nerf/*) onto
gdb_nerf_tpu's flax variable tree:

  torch name                          ours
  ------------------------------------------------------------------
  feature_net.conv0.0.{0,1}           feature_net/ConvBlock_{0,1}
  feature_net.{out0,inner1,...}       feature_net/Conv_{i}
  depth_net.cost_regs.{0,1}.*         depth_net/CostRegNet(Small)_0
  depth_net.nerfs.0.*                 depth_net/stage_nerf_0/*
  nerf.*                              nerf/* (BundleNeRF)
  upsampler.*                         upsampler/* (Decoder)

Weight layout conversions:
  Conv2d (O, I, kh, kw)       -> (kh, kw, I, O)
  Conv3d (O, I, kd, kh, kw)   -> (kd, kh, kw, I, O)
  ConvTranspose3d (I,O,k,k,k) -> flip spatial, -> (k, k, k, I, O)
  Linear (O, I)               -> (I, O)
  BatchNorm: weight->scale, bias->bias, running_mean->mean, running_var->var

Usage: python tools/convert_checkpoint.py ref_latest.pth out.ckpt \
           [--cfg configs/dtu_pretrain.yaml]

Needs torch (CPU) only; the result is written with the framework's msgpack
checkpoint format under key 'net' so run.py / train_net.py load it directly.
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def conv2d(w):
    return np.ascontiguousarray(w.transpose(2, 3, 1, 0))


def conv3d(w):
    return np.ascontiguousarray(w.transpose(2, 3, 4, 1, 0))


def deconv3d(w):
    # torch (I, O, kd, kh, kw): flip spatial, to DHWIO.
    return np.ascontiguousarray(
        w[:, :, ::-1, ::-1, ::-1].transpose(2, 3, 4, 0, 1)
    )


def linear(w):
    return np.ascontiguousarray(w.transpose(1, 0))


def _put(tree: dict, path: str, value: np.ndarray) -> None:
    keys = path.split("/")
    node = tree
    for k in keys[:-1]:
        node = node.setdefault(k, {})
    node[keys[-1]] = value


class Converter:
    """Accumulates params/batch_stats from a torch state dict."""

    def __init__(self, sd: dict):
        self.sd = {k: np.asarray(v) for k, v in sd.items()}
        self.params: dict = {}
        self.stats: dict = {}
        self.used: set[str] = set()

    def take(self, name: str) -> np.ndarray:
        self.used.add(name)
        return self.sd[name]

    def conv_block(self, tname: str, jname: str, three_d: bool) -> None:
        """torch Sequential(Conv, BN, ReLU) -> ConvBlock{Conv_0, BatchNorm_0}."""
        conv = conv3d if three_d else conv2d
        _put(self.params, f"{jname}/Conv_0/kernel", conv(self.take(f"{tname}.0.weight")))
        self.bn(f"{tname}.1", f"{jname}/BatchNorm_0")

    def deconv_block(self, tname: str, jname: str) -> None:
        _put(self.params, f"{jname}/kernel", deconv3d(self.take(f"{tname}.0.weight")))
        self.bn(f"{tname}.1", f"{jname}/BatchNorm_0")

    def bn(self, tname: str, jname: str) -> None:
        _put(self.params, f"{jname}/scale", self.take(f"{tname}.weight"))
        _put(self.params, f"{jname}/bias", self.take(f"{tname}.bias"))
        _put(self.stats, f"{jname}/mean", self.take(f"{tname}.running_mean"))
        _put(self.stats, f"{jname}/var", self.take(f"{tname}.running_var"))
        self.used.add(f"{tname}.num_batches_tracked")

    def conv(self, tname: str, jname: str, three_d: bool = False, bias=True) -> None:
        conv = conv3d if three_d else conv2d
        _put(self.params, f"{jname}/kernel", conv(self.take(f"{tname}.weight")))
        if bias:
            _put(self.params, f"{jname}/bias", self.take(f"{tname}.bias"))

    def dense(self, tname: str, jname: str, bias=True) -> None:
        _put(self.params, f"{jname}/kernel", linear(self.take(f"{tname}.weight")))
        if bias:
            _put(self.params, f"{jname}/bias", self.take(f"{tname}.bias"))

    def dense_split(self, tname: str, splits: list[tuple[str, int, bool]]) -> None:
        """Split a torch Linear over concatenated inputs into several
        Dense kernels: splits = [(jname, in_dim, has_bias)].  The single
        torch bias lands on the (unique) split marked has_bias."""
        w = self.take(f"{tname}.weight")  # (out, in_total)
        bias = self.take(f"{tname}.bias")
        off = 0
        for jname, dim, has_bias in splits:
            _put(self.params, f"{jname}/kernel",
                 np.ascontiguousarray(w[:, off : off + dim].transpose(1, 0)))
            if has_bias:
                _put(self.params, f"{jname}/bias", bias)
            off += dim
        assert off == w.shape[1], (tname, off, w.shape)


def convert(
    sd: dict,
    num_stages: int = 2,
    dec_layers: int = 3,
    stage_feat_dims: tuple = (32,),
    bundle_feat_dim: int = 16,
    voxel_dim: int = 8,
    hid_dim: int = 64,
    strict: bool = False,
) -> dict:
    c = Converter(sd)

    # --- FeatureNet (feature_net.py:17-38) ---
    fn = "feature_net"
    i = 0
    for blk in ("conv0.0", "conv0.1", "conv1.0", "conv1.1", "conv2.0", "conv2.1"):
        c.conv_block(f"{fn}.{blk}", f"{fn}/ConvBlock_{i}", three_d=False)
        i += 1
    c.conv(f"{fn}.out0", f"{fn}/Conv_0")
    c.conv(f"{fn}.inner1", f"{fn}/Conv_1")
    c.conv(f"{fn}.out1", f"{fn}/Conv_2", bias=False)
    c.conv(f"{fn}.inner2", f"{fn}/Conv_3")
    c.conv(f"{fn}.out2", f"{fn}/Conv_4", bias=False)

    # --- DepthNet cost regs ---
    for s in range(num_stages):
        t = f"depth_net.cost_regs.{s}"
        j = f"depth_net/{'CostRegNetSmall_0' if s == 0 else 'CostRegNet_0'}"
        n_down = 2 if s == 0 else 3
        convs = (
            ["conv0", "conv1", "conv2", "conv3", "conv4"]
            if s == 0
            else ["conv0", "conv1", "conv2", "conv3", "conv4", "conv5", "conv6"]
        )
        # Conv order in our modules: c0, (stride, plain) per down level.
        for i2, name in enumerate(convs):
            c.conv_block(f"{t}.{name}", f"{j}/ConvBlock_{i2}", three_d=True)
        deconvs = ["conv5", "conv6"] if s == 0 else ["conv7", "conv8", "conv9"]
        for i2, name in enumerate(deconvs):
            c.deconv_block(f"{t}.{name}", f"{j}/DeconvBlock_{i2}")
        c.conv(f"{t}.feat_head", f"{j}/Conv_0", three_d=True, bias=False)
        c.conv(f"{t}.prob_head", f"{j}/Conv_1", three_d=True, bias=False)

    # --- DepthNet training stage NeRFs (depth_net.py:201-298) ---
    # The aggregation/weight first layers are split (see models/nerf_head.py):
    # W @ cat([shared, per-view]) == W_s @ shared + W_v @ per-view.
    def nerf_head(t: str, j: str, feat_dim: int, voxel_dim: int, hid: int,
                  weight_name: str, j0_shared: str, j0_view: str) -> None:
        if f"{t}.view_fc.0.weight" in c.sd:
            c.dense(f"{t}.view_fc.0", f"{j}/agg/view_fc")
        F = feat_dim + 3
        c.dense_split(f"{t}.global_fc.0", [
            (f"{j}/agg/global_fc_pv", F, False),
            (f"{j}/agg/global_fc_var", F, False),
            (f"{j}/agg/global_fc_mean", F, True),
        ])
        c.dense(f"{t}.agg_w_fc.0", f"{j}/agg/agg_w_fc")
        c.dense(f"{t}.fc.0", f"{j}/agg/fc")
        c.dense(f"{t}.lr0.0", f"{j}/lr0")
        c.dense(f"{t}.sigma.0", f"{j}/sigma")
        c.dense_split(f"{t}.{weight_name}.0", [
            (f"{j}/{j0_shared}", hid + voxel_dim + 16, True),
            (f"{j}/{j0_view}", F + 4, False),
        ])

    for s in range(num_stages - 1):
        t = f"depth_net.nerfs.{s}"
        j = f"depth_net/stage_nerf_{s}"
        nerf_head(t, j, feat_dim=stage_feat_dims[s], voxel_dim=voxel_dim,
                  hid=hid_dim, weight_name="color",
                  j0_shared="color0_shared", j0_view="color0_view")
        c.dense(f"{t}.color.2", f"{j}/color1")

    # --- Bundle NeRF (nerf.py:6-115) ---
    nerf_head("nerf", "nerf", feat_dim=bundle_feat_dim, voxel_dim=voxel_dim,
              hid=hid_dim, weight_name="weight",
              j0_shared="weight0_shared", j0_view="weight0_view")
    c.dense("nerf.weight.2", "nerf/weight1")
    c.dense("nerf.feat_head.0", "nerf/feat_head")

    # --- Decoder (decoder_rdn.py:44-81) ---
    t, j = "upsampler", "upsampler"
    ci = 0
    c.conv(f"{t}.in_conv", f"{j}/Conv_{ci}")
    ci += 1
    for b in range(dec_layers):
        rb = f"{j}/ResidualDenseBlock_{b}"
        c.conv(f"{t}.blocks.{b}.conv1", f"{rb}/Conv_0", bias=False)
        c.conv(f"{t}.blocks.{b}.conv2", f"{rb}/Conv_1", bias=False)
        c.conv(f"{t}.blocks.{b}.conv3", f"{rb}/Conv_2", bias=False)
        c.dense(f"{t}.blocks.{b}.se.fc.0", f"{rb}/SEBlock_0/Dense_0", bias=False)
        c.dense(f"{t}.blocks.{b}.se.fc.2", f"{rb}/SEBlock_0/Dense_1", bias=False)
    # up blocks: Sequential [Conv, PixelShuffle] * log2(b)
    up_idx = 0
    while f"{t}.up.{2 * up_idx}.weight" in c.sd:
        c.conv(f"{t}.up.{2 * up_idx}", f"{j}/Conv_{ci}")
        ci += 1
        up_idx += 1
    c.conv(f"{t}.out_conv", f"{j}/Conv_{ci}")

    unused = set(c.sd) - c.used
    if unused:
        msg = f"{len(unused)} torch tensors unmapped: {sorted(unused)[:20]}"
        if strict:
            raise ValueError(msg)
        print("WARNING:", msg)
    return {"params": c.params, "batch_stats": c.stats}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("src", help="reference .pth checkpoint")
    ap.add_argument("dst", help="output .ckpt path")
    ap.add_argument("--dec_layers", type=int, default=3)
    args = ap.parse_args()

    import torch
    from flax import serialization

    blob = torch.load(args.src, map_location="cpu", weights_only=False)
    sd = blob.get("net", blob)
    sd = {k: v.numpy() if hasattr(v, "numpy") else v for k, v in sd.items()}
    net = convert(sd, dec_layers=args.dec_layers)
    out = {"net": net, "epoch": int(blob.get("epoch", 0))}
    with open(args.dst, "wb") as f:
        f.write(serialization.msgpack_serialize(out))
    print(f"wrote {args.dst}")


if __name__ == "__main__":
    main()
