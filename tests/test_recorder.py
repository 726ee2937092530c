"""Recorder: scalar + image logging and state_dict resume."""

from types import SimpleNamespace

import numpy as np


def _cfg(tmp_path):
    return SimpleNamespace(record_dir=str(tmp_path / "record"), resume=False)


def test_recorder_scalars_and_images(tmp_path, rng):
    from gdb_nerf_tpu.train.recorder import Recorder

    rec = Recorder(_cfg(tmp_path), enabled=True)
    rec.update_loss_stats({"loss": 1.0, "psnr": 20.0})
    rec.step = 5
    rec.record(
        "val",
        stats={"psnr": 21.0},
        image_stats={
            "pred_rgb": rng.uniform(size=(1, 8, 10, 3)).astype(np.float32),
            "nerf_depth": rng.uniform(2, 6, (8, 10)).astype(np.float32),
        },
    )
    # image_stats consumed after the record
    assert rec.image_stats == {}

    if rec.writer is not None:
        rec.writer.flush()
        import glob, os

        files = glob.glob(os.path.join(str(tmp_path / "record"), "events*"))
        assert files and os.path.getsize(files[0]) > 0


def test_recorder_image_normalization(tmp_path, rng):
    from gdb_nerf_tpu.train.recorder import Recorder

    rec = Recorder(_cfg(tmp_path), enabled=True)
    depth = rng.uniform(400, 900, (6, 7)).astype(np.float32)
    rec.update_image_stats({"d": depth, "rgb": np.full((2, 6, 7, 3), 1.7)})
    assert rec.image_stats["d"].shape == (6, 7, 1)
    assert 0.0 <= rec.image_stats["d"].min() <= rec.image_stats["d"].max() <= 1.0
    # batched rgb: first element taken, clamped to [0, 1]
    assert rec.image_stats["rgb"].shape == (6, 7, 3)
    assert rec.image_stats["rgb"].max() == 1.0
    # batched 2-D map, the network's (B, H, W) nerf_depth: first element
    # taken THEN normalized as grayscale (regression: was logged as an
    # H=1 x W x C=W "image").
    rec.update_image_stats({"nd": rng.uniform(2.5, 6.0, (2, 6, 7))})
    assert rec.image_stats["nd"].shape == (6, 7, 1)
    assert 0.0 <= rec.image_stats["nd"].min() <= rec.image_stats["nd"].max() <= 1.0


def test_recorder_state_roundtrip(tmp_path):
    from gdb_nerf_tpu.train.recorder import Recorder

    rec = Recorder(_cfg(tmp_path), enabled=False)
    rec.step = 42
    sd = rec.state_dict()
    rec2 = Recorder(_cfg(tmp_path), enabled=False)
    rec2.load_state_dict(sd)
    assert rec2.step == 42
