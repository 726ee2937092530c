"""Evaluator protocol guardrails.

The reference evaluator (evaluators/gdb_nerf.py:90-95) always reports LPIPS
when eval_lpips is on; if our LPIPS weights are absent, a silently LPIPS-less
metrics table would not be protocol-comparable.  summarize() must mark the
degradation in its returned/printed output, and the recorder must tolerate
the non-numeric marker.
"""

import types

import numpy as np

from gdb_nerf_tpu.eval.evaluator import Evaluator


def _cfg(tmp_path):
    ns = types.SimpleNamespace
    return ns(
        eval_lpips=True,
        save_result=False,
        result_dir=str(tmp_path / "result"),
        test=ns(eval_center=False, eval_depth=False),
    )


def _batch_and_output(rng, H=24, W=32):
    gt = rng.uniform(size=(1, H, W, 3)).astype(np.float32)
    batch = {
        "tar_views": {"rgb": gt, "mask": np.ones((1, H, W), np.uint8)},
        "meta": {"scene": ["scan1"], "tar_view": [0], "frame_id": [0]},
    }
    output = {"rgb": gt + rng.normal(scale=0.01, size=gt.shape).astype(np.float32)}
    return batch, output


def test_lpips_skip_is_marked_in_summary(tmp_path, rng, monkeypatch, capsys):
    # Force the weights-absent path regardless of what's on disk.
    import gdb_nerf_tpu.eval.lpips as lpips_mod

    def _raise():
        raise FileNotFoundError("no weights")

    monkeypatch.setattr(lpips_mod.LPIPS, "load_default", staticmethod(_raise))

    ev = Evaluator(_cfg(tmp_path))
    assert ev.lpips_fn is None and ev.lpips_skipped

    batch, output = _batch_and_output(rng)
    ev.evaluate(output, batch)
    ret = ev.summarize()
    assert ret["lpips"] == "SKIPPED (weights absent)"
    assert "SKIPPED" in capsys.readouterr().out

    # The recorder must swallow the marker rather than crash on float().
    from gdb_nerf_tpu.train.recorder import Recorder

    class _W:
        def add_scalar(self, *a, **k):
            assert isinstance(a[1], float)

        def add_image(self, *a, **k):
            pass

    rec = Recorder.__new__(Recorder)
    rec.enabled = True
    rec.writer = _W()
    rec.step = 0
    rec.loss_stats = {}
    rec.image_stats = {}
    rec.record("val", 1, ret)


def test_lpips_absent_when_disabled(tmp_path, rng):
    cfg = _cfg(tmp_path)
    cfg.eval_lpips = False
    ev = Evaluator(cfg)
    batch, output = _batch_and_output(rng)
    ev.evaluate(output, batch)
    ret = ev.summarize()
    assert "lpips" not in ret  # off is off — no marker, no metric


def test_visualize_depth_numpy_matches_reference_semantics():
    """Port check vs /root/reference/utils/img_utils.py:143-157: nan->0,
    auto range = (min positive, max), JET colormap, returned minmax."""
    import cv2

    from gdb_nerf_tpu.utils.img import visualize_depth_numpy

    depth = np.array(
        [[0.0, 2.0, np.nan], [4.0, 6.0, 3.0]], np.float32
    )
    vis, (mi, ma) = visualize_depth_numpy(depth)
    assert (mi, ma) == (2.0, 6.0)  # zeros/background excluded from min
    assert vis.shape == (2, 3, 3) and vis.dtype == np.uint8
    # Byte-exact vs the reference formula, except below-range values clamp
    # to 0 instead of the reference's undefined negative-float->uint8 cast
    # (background zeros there wrap to arbitrary bytes; documented deviation).
    x = np.nan_to_num(depth)
    x = (np.clip((x - mi) / (ma - mi + 1e-8), 0, 1) * 255).astype(np.uint8)
    np.testing.assert_array_equal(vis, cv2.applyColorMap(x, cv2.COLORMAP_JET))
    # Explicit minmax is honored (shared scale across frames).
    _, back = visualize_depth_numpy(depth, minmax=(0.0, 10.0))
    assert back == [0.0, 10.0]


def test_save_result_writes_depth_viz(tmp_path, rng):
    cfg = _cfg(tmp_path)
    cfg.eval_lpips = False
    cfg.save_result = True
    ev = Evaluator(cfg)
    batch, output = _batch_and_output(rng)
    output["nerf_depth"] = rng.uniform(1.0, 5.0, size=(1, 24, 32)).astype(
        np.float32
    )
    ev.evaluate(output, batch)
    import os

    files = sorted(os.listdir(cfg.result_dir))
    assert "scan1_0_0.png" in files and "scan1_0_0_depth.png" in files
