"""Protocol-scale golden parity: torch replica vs ours, f32 and bf16.

The reference's acceptance gate is `run.py --type evaluate` against its
released checkpoint (/root/reference/run.py:43-73,
/root/reference/evaluators/gdb_nerf.py:116-151; DTU PSNR within 0.05 dB).
The released .pth and real DTU data are not available in this environment,
so this tool runs the same gate against the in-repo torch replica of the
full reference network (tests/test_full_network_parity.py) at the REAL
dtu_eval configuration — num_depth [64,8], is_adaptive, max_num_samples 3,
dec_layers 3 — and at full protocol size (512x640, 3 source views), on
exact-render synthetic scenes:

  1. torch replica, f32  (the stand-in for the reference)
  2. ours, f32           (converted weights, same batch)
  3. ours, bf16          (the shipped bench compute_dtype)

and reports (a) implementation-agreement PSNR between each pair and (b) the
acceptance-gate delta |PSNR_vs_GT(ours) - PSNR_vs_GT(replica)| — the number
that must stay under 0.05 dB.

Weights are seeded-random with randomized BN stats (no trained checkpoint
exists here); agreement PSNR is weight-independent numerics, and the gate
delta measures error propagation through the identical converted weights.

Usage:
  python tools/golden_parity.py [--hw 512 640] [--seeds 0 1] [--scenes 2]
  python tools/golden_parity.py --hw 128 160 --save tests/golden/dtu_eval_golden.npz

--save writes a torch-free golden fixture: the full state_dict, one batch,
and the replica render, so tests/test_golden_protocol.py can re-check ours
against the replica without rebuilding the torch net.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "tests"))
sys.path.insert(0, os.path.join(REPO, "tools"))

# The real dtu_eval configuration (configs/dtu_eval.yaml over dtu_pretrain.yaml).
DTU_EVAL_CFG = dict(
    fpn_base=8, fpn_dims=(32, 16, 8), fpn_scales=(0.25, 0.5, 1.0),
    vol_levels=(0, 1), vol_scales=(0.125, 0.5), ci_scales=(1.0, 1.0),
    voxel_dim=8, num_depth=(64, 8), inv_depth=(True, False),
    bundle=2, global_num_depth=64, max_num_samples=3, max_mip=3, hid=64,
    dec_layers=3,
)
CONVERT_KW = dict(
    num_stages=2, dec_layers=3, stage_feat_dims=(32,), bundle_feat_dim=16,
    voxel_dim=8, hid_dim=64,
)


def psnr(a: np.ndarray, b: np.ndarray) -> float:
    a = np.clip(np.asarray(a, np.float32), 0.0, 1.0)
    b = np.clip(np.asarray(b, np.float32), 0.0, 1.0)
    mse = float(np.mean((a - b) ** 2))
    return float(10.0 * np.log10(1.0 / max(mse, 1e-12)))


def build_replica(seed: int):
    import torch

    import test_full_network_parity as rep

    torch.manual_seed(seed)
    tnet = rep.TorchNetwork(DTU_EVAL_CFG).eval()
    rep._randomize_bn(tnet, np.random.default_rng(seed + 100))
    return tnet


def torch_batch(batch):
    import torch

    return {
        "src_views": {
            "rgb": torch.tensor(
                np.asarray(batch["src_views"]["rgb"], np.float32)
            ).permute(0, 1, 4, 2, 3),
            "extrinsics": torch.tensor(
                np.asarray(batch["src_views"]["extrinsics"], np.float32)),
            "intrinsics": torch.tensor(
                np.asarray(batch["src_views"]["intrinsics"], np.float32)),
        },
        "tar_views": {
            "extrinsics": torch.tensor(
                np.asarray(batch["tar_views"]["extrinsics"], np.float32)),
            "intrinsics": torch.tensor(
                np.asarray(batch["tar_views"]["intrinsics"], np.float32)),
        },
        "near_far": torch.tensor(np.asarray(batch["near_far"], np.float32)),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=[512, 640])
    ap.add_argument("--seeds", type=int, nargs="*", default=[0])
    ap.add_argument("--scenes", type=int, default=2)
    ap.add_argument("--save", default=None)
    ap.add_argument("--device", default="cpu", choices=["cpu", "ambient"],
                    help="where ours runs; replica is always CPU torch")
    ap.add_argument("--skip-bf16", action="store_true",
                    help="skip the bf16 render (saves a second full-size "
                    "compile; the shipped-dtype delta is measured on the "
                    "TPU with --device ambient instead)")
    ap.add_argument("--ckpt", default=None,
                    help="path to OUR trained .ckpt: adds the "
                    "trained-weights gate rows (ours f32 vs bf16 — trained "
                    "BN stats + narrowed CIs are the bf16 error path random "
                    "init does not exercise, VERDICT r4 task 4).  The torch "
                    "replica is skipped for these rows: the checkpoint "
                    "converter is torch->ours only, and the f32 "
                    "implementation agreement is already gated by the "
                    "random-weight rows.")
    args = ap.parse_args()

    import torch

    import jax

    if args.device == "cpu":
        # env vars alone do not redirect on this machine — the ambient
        # sitecustomize force-selects the TPU plugin; jax.config wins
        # (same mechanism as tests/conftest.py).
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from convert_checkpoint import convert
    from gdb_nerf_tpu.config import load_cfg
    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.runtime import make_network

    H, W = args.hw
    cfg = load_cfg(
        os.path.join(REPO, "configs/dtu_eval.yaml"),
        ["synthetic", "True", "synthetic_hw", f"[{H},{W}]"],
    )
    loader = make_data_loader(cfg, is_train=False)
    batches = []
    for i, b in enumerate(loader):
        if i >= args.scenes:
            break
        batches.append(b)

    network = make_network(cfg)  # compute_dtype float32 by default
    import dataclasses

    net_bf16 = dataclasses.replace(network, compute_dtype="bfloat16")

    rows = []
    if args.ckpt:
        from gdb_nerf_tpu.utils.checkpoint import _read

        raw = _read(args.ckpt)
        net_state = raw.get("net", raw)
        variables = {
            "params": net_state["params"],
            "batch_stats": net_state["batch_stats"],
        }
        for si, batch in enumerate(batches):
            gt = np.asarray(batch["tar_views"]["rgb"], np.float32)
            dev = {
                k: jax.tree.map(jnp.asarray, batch[k])
                for k in ("src_views", "tar_views", "near_far")
            }
            ours32 = np.asarray(
                jax.jit(lambda v, b: network.apply(v, b, train=False)[0])(
                    variables, dev
                )["rgb"]
            )
            ours16 = np.asarray(
                jax.jit(lambda v, b: net_bf16.apply(v, b, train=False)[0])(
                    variables, dev
                )["rgb"], np.float32
            )
            row = dict(
                ckpt=os.path.basename(args.ckpt), scene=si,
                epoch=int(raw.get("epoch", -1)),
                agree_bf16_vs_f32=psnr(ours16, ours32),
                gt_ours_f32=psnr(ours32, gt),
                gt_ours_bf16=psnr(ours16, gt),
            )
            row["gate_delta_bf16_trained"] = abs(
                row["gt_ours_bf16"] - row["gt_ours_f32"]
            )
            rows.append(row)
            print(json.dumps(row))
        worst = max(r["gate_delta_bf16_trained"] for r in rows)
        print(json.dumps({
            "ckpt": args.ckpt, "rows": len(rows),
            "worst_gate_delta_bf16_trained": round(worst, 4),
            "gate_bar": 0.05, "pass": bool(worst < 0.05),
        }))
        return

    for seed in args.seeds:
        tnet = build_replica(seed)
        sd = {k: v.numpy() for k, v in tnet.state_dict().items()}
        tree = convert(sd, **CONVERT_KW)
        variables = {
            "params": tree["params"], "batch_stats": tree["batch_stats"]
        }
        for si, batch in enumerate(batches):
            gt = np.asarray(batch["tar_views"]["rgb"], np.float32)
            with torch.no_grad():
                ret_t = tnet(torch_batch(batch), is_adaptive=True)
            replica = ret_t["rgb"].numpy().transpose(0, 2, 3, 1)

            dev = {
                k: jax.tree.map(jnp.asarray, batch[k])
                for k in ("src_views", "tar_views", "near_far")
            }
            ours32 = np.asarray(
                jax.jit(lambda v, b: network.apply(v, b, train=False)[0])(
                    variables, dev
                )["rgb"]
            )
            row = dict(
                seed=seed, scene=si,
                agree_f32=psnr(ours32, replica),
                gt_replica=psnr(replica, gt),
                gt_ours_f32=psnr(ours32, gt),
            )
            row["gate_delta_f32"] = abs(row["gt_ours_f32"] - row["gt_replica"])
            if not args.skip_bf16:
                ours16 = np.asarray(
                    jax.jit(lambda v, b: net_bf16.apply(v, b, train=False)[0])(
                        variables, dev
                    )["rgb"], np.float32
                )
                row["agree_bf16"] = psnr(ours16, replica)
                row["agree_bf16_vs_f32"] = psnr(ours16, ours32)
                row["gt_ours_bf16"] = psnr(ours16, gt)
                row["gate_delta_bf16"] = abs(
                    row["gt_ours_bf16"] - row["gt_replica"])
            rows.append(row)
            print(json.dumps(row))

            if args.save and seed == args.seeds[0] and si == 0:
                os.makedirs(os.path.dirname(args.save), exist_ok=True)
                payload = {f"sd/{k}": v for k, v in sd.items()}
                payload.update({
                    "batch/src_rgb": np.asarray(batch["src_views"]["rgb"],
                                                np.float32),
                    "batch/src_ext": np.asarray(
                        batch["src_views"]["extrinsics"], np.float32),
                    "batch/src_int": np.asarray(
                        batch["src_views"]["intrinsics"], np.float32),
                    "batch/tar_ext": np.asarray(
                        batch["tar_views"]["extrinsics"], np.float32),
                    "batch/tar_int": np.asarray(
                        batch["tar_views"]["intrinsics"], np.float32),
                    "batch/near_far": np.asarray(batch["near_far"],
                                                 np.float32),
                    "golden/rgb": replica.astype(np.float32),
                    "golden/mvs_depth": ret_t["mvs_depth"].numpy(),
                    "golden/nerf_depth": ret_t["nerf_depth"].numpy(),
                    "meta/convert_kw": np.frombuffer(
                        json.dumps(CONVERT_KW).encode(), np.uint8),
                })
                np.savez_compressed(args.save, **payload)
                print(f"wrote golden fixture {args.save} "
                      f"({os.path.getsize(args.save)/1e6:.1f} MB)")

    def agg(key):
        v = [r[key] for r in rows]
        return f"{np.mean(v):.3f} (min {np.min(v):.3f}, max {np.max(v):.3f})"

    print(f"\n== {H}x{W}, {len(rows)} renders ==")
    for k in ("agree_f32", "agree_bf16", "agree_bf16_vs_f32"):
        if k in rows[0]:
            print(f"{k:>22}: {agg(k)} dB")
    for k in ("gate_delta_f32", "gate_delta_bf16"):
        if k in rows[0]:
            print(f"{k:>22}: {agg(k)} dB   (gate: < 0.05)")


if __name__ == "__main__":
    main()
