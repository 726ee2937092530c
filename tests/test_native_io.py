"""Tests for the native C++ IO core (decode, resize, PFM, pool)."""

import os
import tempfile

import cv2
import numpy as np
import pytest

from gdb_nerf_tpu.datasets import native
from gdb_nerf_tpu.utils.io import write_pfm, read_pfm

pytestmark = pytest.mark.skipif(
    not native.available(), reason="native lib not built"
)


@pytest.fixture
def png_file(rng, tmp_path):
    img = (rng.uniform(0, 255, (40, 56, 3))).astype(np.uint8)
    path = str(tmp_path / "t.png")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    return path, img


def test_decode_matches_cv2(png_file):
    path, img = png_file
    out = native.decode_image(path)
    assert out.shape == (40, 56, 3)
    np.testing.assert_allclose(out, img.astype(np.float32) / 255.0, atol=1e-6)


def test_decode_resize_matches_cv2_linear(png_file):
    path, img = png_file
    out = native.decode_image(path, (20, 28))
    ref = cv2.resize(
        img.astype(np.float32) / 255.0, (28, 20), interpolation=cv2.INTER_LINEAR
    )
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_decode_rgba_white_background(rng, tmp_path):
    rgba = (rng.uniform(0, 255, (16, 16, 4))).astype(np.uint8)
    path = str(tmp_path / "a.png")
    cv2.imwrite(path, cv2.cvtColor(rgba, cv2.COLOR_RGBA2BGRA))
    out = native.decode_image(path, white_bg=True)
    a = rgba[..., 3:].astype(np.float32) / 255.0
    ref = (rgba[..., :3].astype(np.float32) / 255.0) * a + (1 - a)
    np.testing.assert_allclose(out, ref, atol=1e-5)


def test_jpeg_decode(rng, tmp_path):
    img = (rng.uniform(0, 255, (32, 32, 3))).astype(np.uint8)
    path = str(tmp_path / "t.jpg")
    cv2.imwrite(path, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
    out = native.decode_image(path)
    ref = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB).astype(np.float32) / 255
    np.testing.assert_allclose(out, ref, atol=0.02)  # codec noise only


def test_pfm_roundtrip(rng, tmp_path):
    depth = rng.uniform(400, 900, (24, 30)).astype(np.float32)
    path = str(tmp_path / "d.pfm")
    write_pfm(path, depth)
    ours = native.read_pfm(path)
    pyref = read_pfm(path)[0]
    np.testing.assert_allclose(ours, depth, rtol=1e-6)
    np.testing.assert_allclose(ours, pyref, rtol=1e-6)


def test_decode_pool_parallel(rng, tmp_path):
    paths, refs = [], []
    for i in range(8):
        img = (rng.uniform(0, 255, (24, 24, 3))).astype(np.uint8)
        p = str(tmp_path / f"p{i}.png")
        cv2.imwrite(p, cv2.cvtColor(img, cv2.COLOR_RGB2BGR))
        paths.append(p)
        refs.append(img.astype(np.float32) / 255.0)
    pool = native.DecodePool(4)
    outs = [pool.submit(p, (24, 24)) for p in paths]
    pool.wait()
    for out, ref in zip(outs, refs):
        np.testing.assert_allclose(out, ref, atol=1e-6)


def test_missing_file_raises():
    with pytest.raises(IOError):
        native.decode_image("/nonexistent/file.png")


def test_pool_reports_errors(tmp_path):
    pool = native.DecodePool(2)
    pool.submit("/nonexistent/x.png", (8, 8))
    with pytest.raises(IOError):
        pool.wait()
