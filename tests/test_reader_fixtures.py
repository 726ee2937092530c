"""Dataset readers against synthesized miniature on-disk trees.

Real DTU/LLFF/Blender data is absent from this machine, so these tests
materialize tiny but format-faithful dataset trees in tmp_path (DTU cam.txt
+ 1200x1600 pfm + 512x640 rectified pngs; LLFF poses_bounds.npy + images_4;
Blender transforms_train.json + RGBA frames) and run each Dataset's
build_metas + __getitem__ end to end, asserting the batch-dict contract
(shapes, intrinsic rescaling, near/far math, masks, multiscale GT pyramid).
Formats follow /root/reference/datasets/dataloader/{dtu,llff,nerf}.py and
utils/data_utils.py:55-118.
"""

import json
import os
from types import SimpleNamespace

import cv2
import numpy as np
import pytest

from gdb_nerf_tpu.utils.io import write_pfm


def _cfg(workspace, num_depth=64, vol_scales=(0.125, 0.5)):
    return SimpleNamespace(
        workspace=str(workspace),
        fix_random=True,
        nerf=SimpleNamespace(global_num_depth=num_depth),
        mvs=SimpleNamespace(vol_scales=list(vol_scales)),
        train=SimpleNamespace(
            sampler_meta=SimpleNamespace(input_views_num=[2, 3, 4])
        ),
        test=SimpleNamespace(sampler_meta=SimpleNamespace(input_views_num=[3])),
    )


def _lookat_ext(angle, radius=4.0):
    """w2c of a camera on a small arc looking roughly at the origin."""
    c, s = np.cos(angle), np.sin(angle)
    R = np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], np.float64)
    t = np.array([0.3 * s, 0.0, radius], np.float64)
    E = np.eye(4)
    E[:3, :3] = R
    E[:3, 3] = t
    return E


def test_dtu_reader_fixture(tmp_path):
    root = tmp_path / "dtu"
    scene = "scan1"
    (root / "Cameras" / "train").mkdir(parents=True)
    (root / "Depths" / scene).mkdir(parents=True)
    (root / f"Rectified/{scene}_train").mkdir(parents=True)

    K4 = np.array([[361.54, 0, 82.9], [0, 360.39, 66.4], [0, 0, 1]], np.float64)
    depth_min, depth_interval = 425.0, 2.5
    for i in range(49):
        E = _lookat_ext(0.02 * i, radius=600.0)
        lines = ["extrinsic"]
        lines += [" ".join(f"{x:.6f}" for x in row) for row in E]
        lines += ["", "intrinsic"]
        lines += [" ".join(f"{x:.6f}" for x in row) for row in K4]
        lines += ["", f"{depth_min} {depth_interval}"]
        (root / "Cameras/train" / f"{i:08d}_cam.txt").write_text(
            "\n".join(lines) + "\n"
        )

    ann = tmp_path / "scenes.txt"
    ann.write_text(f"{scene}\n")

    from gdb_nerf_tpu.datasets.dtu import Dataset

    cfg = _cfg(tmp_path)
    ds = Dataset(
        cfg, data_root="dtu", split="test", ann_file=str(ann), scene=scene
    )
    assert len(ds) == 4  # dtu_val render ids
    scene_name, tar_view, src_views = ds.metas[0]
    assert len(src_views) == 3

    # Materialize only the images/depth the first item actually reads.
    for v in set(src_views + [tar_view]):
        img = np.full((512, 640, 3), 10 + 4 * v, np.uint8)
        cv2.imwrite(str(root / f"Rectified/{scene}_train/rect_{v + 1:03d}_3_r5000.png"), img)
    write_pfm(str(root / f"Depths/{scene}/depth_map_{tar_view:04d}.pfm"),
              np.full((1200, 1600), 500.0, np.float32))

    item = ds[(0, 3, 1.0)]
    sv, tv = item["src_views"], item["tar_views"]
    assert sv["rgb"].shape == (3, 512, 640, 3)
    assert sv["extrinsics"].shape == (3, 4, 4)
    assert sv["intrinsics"].shape == (3, 3, 3)
    # camera files store 1/4-res intrinsics; the reader scales x4
    np.testing.assert_allclose(sv["intrinsics"][0][:2], (K4 * 4)[:2], rtol=1e-5)
    np.testing.assert_allclose(sv["intrinsics"][0][2], [0, 0, 1], atol=1e-6)
    # pixel values survive the png roundtrip
    v0 = src_views[0]
    np.testing.assert_allclose(sv["rgb"][0], (10 + 4 * v0) / 255.0, atol=1e-6)

    assert tv["rgb"].shape == (512, 640, 3)
    assert tv["depth"].shape == (512, 640)  # pfm: x0.5 then crop [44:556, 80:720]
    np.testing.assert_allclose(tv["depth"], 500.0)
    assert tv["mask"].dtype == np.uint8 and tv["mask"].min() == 1

    # near/far: depth_min + interval * (1/(D/192)) * D
    scale = 1.0 / (64 / 192)
    np.testing.assert_allclose(
        item["near_far"], [425.0, 425.0 + 2.5 * scale * 64], rtol=1e-6
    )

    # multiscale GT pyramid at vol_scales
    assert item["tar_gt_ms"]["rgb"][0].shape == (64, 80, 3)
    assert item["tar_gt_ms"]["rgb"][1].shape == (256, 320, 3)
    assert item["tar_gt_ms"]["depth"][1].shape == (256, 320)

    # render_scale resizing
    item_half = ds[(0, 3, 0.5)]
    assert item_half["tar_views"]["rgb"].shape == (256, 320, 3)
    assert item_half["tar_views"]["depth"].shape == (256, 320)


def test_llff_reader_fixture(tmp_path):
    scene = "fern"  # must exist in pairs.json
    root = tmp_path / "llff"
    (root / scene / "images_4").mkdir(parents=True)

    n = 20
    H4, W4, focal4 = 32, 48, 60.0
    poses = np.zeros((n, 3, 5))
    for i in range(n):
        c2w = np.linalg.inv(_lookat_ext(0.05 * i))
        # llff rows = (down, right, back): invert the reader's reordering
        poses[i, :3, 0] = c2w[:3, 1]  # down column holds u (reader swaps)
        poses[i, :3, 1] = c2w[:3, 0]
        poses[i, :3, 2] = -c2w[:3, 2]
        poses[i, :3, 3] = c2w[:3, 3]
        poses[i, :, 4] = [H4 * 2 / 0.25 / 2, W4 * 2 / 0.25 / 2, focal4 / 0.25]
    # NB the reader multiplies intrinsics x0.25 for images_4 and divides
    # principal point by 2; store values that land on (W4/2, H4/2, focal4).
    poses[:, 0, 4] = H4 / 0.25  # h
    poses[:, 1, 4] = W4 / 0.25  # w
    poses[:, 2, 4] = focal4 / 0.25  # f
    bounds = np.tile([2.0, 6.0], (n, 1))
    bounds[0] = [1.5, 5.0]
    np.save(root / scene / "poses_bounds.npy",
            np.concatenate([poses.reshape(n, 15), bounds], axis=1))

    for i in range(n):
        img = np.full((H4, W4, 3), 5 * i + 3, np.uint8)
        cv2.imwrite(str(root / scene / "images_4" / f"image{i:03d}.png"), img)

    from gdb_nerf_tpu.datasets.llff import Dataset

    cfg = _cfg(tmp_path)
    ds = Dataset(
        cfg, data_root="llff", split="test", input_h_w=[64, 96], scene=scene
    )
    assert len(ds) == 4
    scene_name, tar_view, src_views = ds.metas[0]

    item = ds[(0, 3, 1.0)]
    sv, tv = item["src_views"], item["tar_views"]
    assert sv["rgb"].shape == (3, 64, 96, 3)
    assert tv["rgb"].shape == (64, 96, 3)
    assert tv["mask"].min() == 1.0  # all-ones mask (llff.py:121 in reference)
    # intrinsics rescaled from images_4 size to input_h_w (x2 here)
    np.testing.assert_allclose(sv["intrinsics"][0][0, 0], focal4 * 2, rtol=1e-5)
    np.testing.assert_allclose(sv["intrinsics"][0][0, 2], W4 / 2 * 2, rtol=1e-5)
    # scene-global near/far = min/max over per-view bounds
    np.testing.assert_allclose(item["near_far"], [1.5, 6.0], rtol=1e-6)
    # extrinsics invert the stored c2w
    c2w = np.linalg.inv(tv["extrinsics"])
    np.testing.assert_allclose(
        c2w[:3, 3], np.linalg.inv(_lookat_ext(0.05 * tar_view))[:3, 3],
        atol=1e-5,
    )
    # value roundtrip (constant images survive resize)
    np.testing.assert_allclose(tv["rgb"], (5 * tar_view + 3) / 255.0, atol=1e-6)


def test_nerf_reader_fixture(tmp_path):
    scene = "lego"  # must exist in pairs.json
    root = tmp_path / "nerf"
    (root / scene / "train").mkdir(parents=True)

    n = 71  # pairs lego ids go up to 70
    frames = []
    for i in range(n):
        c2w_cv = np.linalg.inv(_lookat_ext(0.04 * i))
        # stored matrices are Blender-convention: c2w_blender = c2w_cv @ B2C
        # (B2C is its own inverse)
        b2c = np.diag([1.0, -1.0, -1.0, 1.0])
        frames.append({"transform_matrix": (c2w_cv @ b2c).tolist()})
    meta = {"camera_angle_x": 0.6911112070083618, "frames": frames}
    (root / scene / "transforms_train.json").write_text(json.dumps(meta))

    from gdb_nerf_tpu.datasets.nerf import Dataset

    cfg = _cfg(tmp_path, vol_scales=(0.125, 0.5))
    ds = Dataset(cfg, data_root="nerf", split="test", scene=scene)
    assert len(ds) == 4
    scene_name, tar_view, src_views = ds.metas[0]

    # Materialize only the RGBA frames the first item reads: color 100 with
    # alpha ramp so white-background compositing is observable.
    for v in set(src_views + [tar_view]):
        img = np.zeros((800, 800, 4), np.uint8)
        img[..., :3] = 100
        img[..., 3] = 128  # alpha 0.5
        cv2.imwrite(str(root / scene / "train" / f"r_{v}.png"), img)

    item = ds[(0, 3, 1.0)]
    sv, tv = item["src_views"], item["tar_views"]
    assert sv["rgb"].shape == (3, 800, 800, 3)
    assert tv["rgb"].shape == (800, 800, 3)
    # white background: rgb*a + (1-a) with a=0.5 -> 100/255*0.5 + 0.5
    expect = (100 / 255.0) * (128 / 255.0) + (1 - 128 / 255.0)
    np.testing.assert_allclose(tv["rgb"], expect, atol=1e-2)
    # focal from camera_angle_x
    focal = 0.5 * 800 / np.tan(0.5 * meta["camera_angle_x"])
    np.testing.assert_allclose(sv["intrinsics"][0][0, 0], focal, rtol=1e-6)
    np.testing.assert_allclose(sv["intrinsics"][0][0, 2], 400.0)
    # fixed near/far
    np.testing.assert_allclose(item["near_far"], [2.5, 5.5])
    # extrinsics: Blender -> CV conversion roundtrips
    np.testing.assert_allclose(
        tv["extrinsics"], _lookat_ext(0.04 * tar_view).astype(np.float32),
        atol=1e-5,
    )
