"""Tests for samplers, collation, and the synthetic dataset pipeline."""

import os
from types import SimpleNamespace

import numpy as np

from gdb_nerf_tpu.config import load_cfg
from gdb_nerf_tpu.datasets import make_data_loader
from gdb_nerf_tpu.datasets import samplers as S
from gdb_nerf_tpu.datasets.loader import collate

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _meta(views=(2, 3), probs=(0.5, 0.5)):
    return SimpleNamespace(
        input_views_num=list(views),
        input_views_prob=list(probs),
        render_scale=[1.0],
        scale_prob=[1.0],
    )


def test_enerf_batch_sampler_uniform_views_within_batch():
    bs = S.EnerfBatchSampler(S.SequentialSampler(20), 4, False, _meta())
    seen = set()
    for batch in bs:
        views = {v for _, v, _ in batch}
        assert len(views) == 1  # one view count per batch
        seen |= views
        assert all(s == 1.0 for _, _, s in batch)
    assert seen <= {2, 3}


def test_iteration_based_sampler_loops():
    inner = S.DefaultBatchSampler(S.SequentialSampler(5), 2, False, _meta())
    it = S.IterationBasedBatchSampler(inner, 10)
    batches = list(it)
    assert len(batches) == 10


def test_sharded_sampler_partitions():
    n = 10
    all_idx = []
    for shard in range(4):
        s = S.ShardedSampler(n, 4, shard, shuffle=False)
        idx = list(s)
        assert len(idx) == 3  # ceil(10/4)
        all_idx += idx
    assert set(all_idx) == set(range(10))  # covers all (with padding dupes)


def test_sharded_sampler_epoch_reshuffles():
    s = S.ShardedSampler(16, 2, 0, shuffle=True)
    s.set_epoch(0)
    a = list(s)
    s.set_epoch(1)
    b = list(s)
    assert a != b


def test_collate_stacks_and_keeps_meta():
    items = [
        {
            "x": np.ones((2, 2)),
            "nested": {"y": np.zeros(3)},
            "lst": [np.ones(1), np.ones(2)],
            "scalar": 1.5,
            "meta": {"scene": "a", "tar_view": 3},
        },
        {
            "x": np.ones((2, 2)),
            "nested": {"y": np.zeros(3)},
            "lst": [np.ones(1), np.ones(2)],
            "scalar": 2.5,
            "meta": {"scene": "b", "tar_view": 4},
        },
    ]
    batch = collate(items)
    assert batch["x"].shape == (2, 2, 2)
    assert batch["nested"]["y"].shape == (2, 3)
    assert batch["lst"][1].shape == (2, 2)
    assert batch["scalar"].tolist() == [1.5, 2.5]
    assert batch["meta"]["scene"] == ["a", "b"]


def test_synthetic_loader_end_to_end():
    os.chdir(REPO)
    cfg = load_cfg("configs/dtu_eval.yaml", ["synthetic", "True"])
    loader = make_data_loader(cfg, is_train=False)
    batch = next(iter(loader))
    rgb = batch["src_views"]["rgb"]
    assert rgb.shape == (1, 3, 512, 640, 3)  # B, V, H, W, C channels-last
    assert batch["tar_views"]["rgb"].shape == (1, 512, 640, 3)
    assert batch["near_far"].shape == (1, 2)
    assert batch["src_views"]["extrinsics"].shape == (1, 3, 4, 4)
    assert 0.0 <= rgb.min() and rgb.max() <= 1.0


def test_synthetic_multiview_consistency():
    """Pixels in different source views that see the same plane point agree."""
    os.chdir(REPO)
    cfg = load_cfg("configs/dtu_eval.yaml", ["synthetic", "True"])
    from gdb_nerf_tpu.datasets.synthetic import Dataset

    ds = Dataset(cfg, split="test")
    item = ds[(0, 2, 1.0)]
    img0 = item["src_views"]["rgb"][0]
    ext0 = item["src_views"]["extrinsics"][0]
    K = item["src_views"]["intrinsics"][0]
    # Reproject the plane point seen by pixel (100, 100) of view 0 into view 1.
    inv_K = np.linalg.inv(K)
    pix = np.array([100.5, 100.5, 1.0])
    c2w = np.linalg.inv(ext0)
    d = c2w[:3, :3] @ (inv_K @ pix)
    o = c2w[:3, 3]
    t = (ds.PLANE_Z - o[2]) / d[2]
    world = o + t * d
    ext1 = item["src_views"]["extrinsics"][1]
    cam1 = ext1[:3, :3] @ world + ext1[:3, 3]
    uv1 = (K @ (cam1 / cam1[2]))[:2]
    img1 = item["src_views"]["rgb"][1]
    x1, y1 = int(uv1[0]), int(uv1[1])
    if 0 <= x1 < 640 and 0 <= y1 < 512:
        np.testing.assert_allclose(
            img0[100, 100], img1[y1, x1], atol=0.05
        )


def test_image_size_batch_sampler():
    bs = S.ImageSizeBatchSampler(S.SequentialSampler(9), 3, False)
    batches = list(bs)
    assert len(batches) == 3
    for batch in batches:
        hws = {(h, w) for _, h, w in batch}
        assert len(hws) == 1  # one size per batch
        (h, w) = next(iter(hws))
        # Reference rounds UP to the next multiple of 32: (v | 31) + 1.
        assert h % 32 == 0 and w % 32 == 0
        assert 256 < h <= 512 and 256 < w <= 672

    origin = S.ImageSizeBatchSampler(
        S.SequentialSampler(3), 3, False, strategy="origin"
    )
    (batch,) = list(origin)
    assert all((h, w) == (-1, -1) for _, h, w in batch)
