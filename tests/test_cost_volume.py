"""Tests for plane-sweep cost volume math and depth regression.

The torch-based checks in this file re-derive the reference semantics
(/root/reference/networks/gdb_nerf/depth_net.py:399-514) as an executable
spec and compare our JAX ops against them.
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax
import jax.numpy as jnp

from gdb_nerf_tpu.ops import camera, cost_volume


def random_camera(rng, H, W, jitter=0.3):
    """A DTU-like camera: intrinsics ~ focal 2W, small rotation, offset."""
    K = np.array(
        [[2.0 * W, 0.0, W / 2], [0.0, 2.0 * W, H / 2], [0.0, 0.0, 1.0]],
        dtype=np.float32,
    )
    angle = rng.uniform(-jitter, jitter, 3)
    Rx = np.array(
        [
            [1, 0, 0],
            [0, np.cos(angle[0]), -np.sin(angle[0])],
            [0, np.sin(angle[0]), np.cos(angle[0])],
        ]
    )
    Ry = np.array(
        [
            [np.cos(angle[1]), 0, np.sin(angle[1])],
            [0, 1, 0],
            [-np.sin(angle[1]), 0, np.cos(angle[1])],
        ]
    )
    R = (Rx @ Ry).astype(np.float32)
    t = rng.uniform(-0.5, 0.5, 3).astype(np.float32)
    ext = np.eye(4, dtype=np.float32)
    ext[:3, :3] = R
    ext[:3, 3] = t + np.array([0, 0, 4.0], dtype=np.float32)
    return ext, K


def test_invert_extrinsics(rng):
    ext, _ = random_camera(rng, 32, 32)
    inv = np.asarray(camera.invert_extrinsics(jnp.array(ext)))
    np.testing.assert_allclose(inv, np.linalg.inv(ext), rtol=1e-5, atol=1e-5)


def test_invert_intrinsics(rng):
    _, K = random_camera(rng, 32, 48)
    inv = np.asarray(camera.invert_intrinsics(jnp.array(K)))
    np.testing.assert_allclose(inv, np.linalg.inv(K), rtol=1e-5, atol=1e-6)


def test_build_rays_projects_back(rng):
    """A point along ray (i, j) at depth d must project back to pixel (i, j)."""
    H, W = 16, 24
    ext, K = random_camera(rng, H, W)
    rays_o, rays_d, uv, z_axis = camera.build_rays(jnp.array(ext), jnp.array(K), H, W)
    d = 3.7
    pts = rays_o + rays_d * d  # (H, W, 3)
    pix, depth, _ = camera.project_points(pts, jnp.array(ext), jnp.array(K))
    x, y = camera.pixel_centers(H, W)
    np.testing.assert_allclose(np.asarray(pix[..., 0]), np.asarray(x), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(pix[..., 1]), np.asarray(y), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(depth), d, rtol=1e-4)


@pytest.mark.parametrize("inv_depth", [False, True])
def test_get_depth_values(inv_depth):
    near_far = jnp.array([2.0, 6.0]).reshape(2, 1, 1) * jnp.ones((2, 3, 4))
    dv = cost_volume.get_depth_values(near_far, 8, inv_depth)
    assert dv.shape == (8, 3, 4)
    if inv_depth:
        np.testing.assert_allclose(float(dv[0, 0, 0]), 0.5, rtol=1e-6)
        np.testing.assert_allclose(float(dv[-1, 0, 0]), 1.0 / 6.0, rtol=1e-6)
    else:
        np.testing.assert_allclose(float(dv[0, 0, 0]), 2.0, rtol=1e-6)
        np.testing.assert_allclose(float(dv[-1, 0, 0]), 6.0, rtol=1e-6)
        np.testing.assert_allclose(
            np.asarray(dv[:, 0, 0]), np.linspace(2.0, 6.0, 8), rtol=1e-6
        )


def torch_cost_volume(src_feat, src_exts, src_ints, tar_ext, tar_int, depth_values):
    """Executable spec of the reference homography warp + variance metric."""
    V, C, Hs, Ws = src_feat.shape
    D, Ht, Wt = depth_values.shape
    src_projs = src_ints @ src_exts[:, :3, :]  # (V, 3, 4)
    tar_proj = tar_int @ tar_ext[:3, :]
    tar_proj4 = torch.eye(4)
    tar_proj4[:3] = tar_proj
    proj = src_projs @ torch.inverse(tar_proj4)[None]  # (V, 3, 4)

    ys, xs = torch.meshgrid(
        torch.arange(Ht, dtype=torch.float32) + 0.5,
        torch.arange(Wt, dtype=torch.float32) + 0.5,
        indexing="ij",
    )
    pix = torch.stack([xs, ys, torch.ones_like(xs)], dim=0).reshape(3, -1)  # (3, HW)
    xyz = proj[:, :, :3] @ pix  # (V, 3, HW)
    xyz = xyz[:, :, None, :] * depth_values.reshape(1, 1, D, -1) + proj[:, :, 3:, None]
    grid = xyz[:, :2] / xyz[:, 2:3].clamp_min(1e-6)  # (V, 2, D, HW)
    gx = 2 * grid[:, 0] / Ws - 1
    gy = 2 * grid[:, 1] / Hs - 1
    g = torch.stack([gx, gy], dim=-1)  # (V, D, HW, 2)
    warped = F.grid_sample(
        src_feat, g, mode="bilinear", padding_mode="zeros", align_corners=False
    )  # (V, C, D, HW)
    warped = warped.reshape(V, C, D, Ht, Wt)
    return torch.var(warped, dim=0, unbiased=False)  # (C, D, Ht, Wt)


def test_build_cost_volume_matches_spec(rng):
    Hs, Ws, C = 20, 28, 6
    Ht, Wt, D = 10, 14, 5
    V = 3
    tar_ext, tar_K = random_camera(rng, Ht, Wt)
    cams = [random_camera(rng, Hs, Ws) for _ in range(V)]
    src_exts = np.stack([c[0] for c in cams])
    src_ints = np.stack([c[1] for c in cams])
    feats = rng.standard_normal((V, Hs, Ws, C)).astype(np.float32)
    depth_values = np.linspace(2.0, 6.0, D, dtype=np.float32)[:, None, None] * np.ones(
        (D, Ht, Wt), dtype=np.float32
    )

    ours = cost_volume.build_cost_volume(
        jnp.array(feats),
        jnp.array(src_exts),
        jnp.array(src_ints),
        jnp.array(tar_ext),
        jnp.array(tar_K),
        jnp.array(depth_values),
        inv_depth=False,
    )  # (D, Ht, Wt, C)

    ref = torch_cost_volume(
        torch.from_numpy(feats).permute(0, 3, 1, 2),
        torch.from_numpy(src_exts),
        torch.from_numpy(src_ints),
        torch.from_numpy(tar_ext),
        torch.from_numpy(tar_K),
        torch.from_numpy(depth_values),
    )  # (C, D, Ht, Wt)

    np.testing.assert_allclose(
        np.asarray(ours), ref.permute(1, 2, 3, 0).numpy(), rtol=1e-3, atol=1e-4
    )


def test_build_cost_volume_flat_accumulation_is_bit_exact(rng, monkeypatch):
    """GDBN_CV_FLAT accumulates the variance moments in flat (D*Ht*Wt, C)
    row-major form (layout-copy fix, PERF.md round 4); the reshape is a
    row-major identity, so results must be bit-identical."""
    Hs, Ws, C = 20, 28, 6
    Ht, Wt, D = 10, 14, 5
    V = 3
    tar_ext, tar_K = random_camera(rng, Ht, Wt)
    cams = [random_camera(rng, Hs, Ws) for _ in range(V)]
    src_exts = jnp.array(np.stack([c[0] for c in cams]))
    src_ints = jnp.array(np.stack([c[1] for c in cams]))
    feats = jnp.array(rng.standard_normal((V, Hs, Ws, C)).astype(np.float32))
    dv = jnp.array(
        np.linspace(2.0, 6.0, D, dtype=np.float32)[:, None, None]
        * np.ones((D, Ht, Wt), dtype=np.float32)
    )

    def vol():
        return cost_volume.build_cost_volume(
            feats, src_exts, src_ints, jnp.array(tar_ext), jnp.array(tar_K),
            dv, inv_depth=False,
        )

    monkeypatch.setattr(cost_volume, "_CV_FLAT", False)
    base = np.asarray(jax.jit(vol)())
    monkeypatch.setattr(cost_volume, "_CV_FLAT", True)
    flat = np.asarray(jax.jit(vol)())
    np.testing.assert_array_equal(flat, base)


def test_build_cost_volume_sequential_matches_unrolled(rng):
    """The training-only scan+checkpoint view accumulation (used so the
    rematted backward holds one view's warp temps at a time) must match the
    unrolled eval path in both value and gradients."""
    Hs, Ws, C = 20, 28, 6
    Ht, Wt, D = 10, 14, 5
    V = 3
    tar_ext, tar_K = random_camera(rng, Ht, Wt)
    cams = [random_camera(rng, Hs, Ws) for _ in range(V)]
    src_exts = jnp.array(np.stack([c[0] for c in cams]))
    src_ints = jnp.array(np.stack([c[1] for c in cams]))
    feats = jnp.array(rng.standard_normal((V, Hs, Ws, C)).astype(np.float32))
    dv = jnp.array(
        np.linspace(2.0, 6.0, D, dtype=np.float32)[:, None, None]
        * np.ones((D, Ht, Wt), dtype=np.float32)
    )
    cot = jnp.array(rng.standard_normal((D, Ht, Wt, C)).astype(np.float32))

    def loss(f, d, seq):
        vol = cost_volume.build_cost_volume(
            f, src_exts, src_ints, jnp.array(tar_ext), jnp.array(tar_K),
            d, inv_depth=False, sequential=seq,
        )
        return jnp.sum(vol * cot)

    v_u, g_u = jax.value_and_grad(loss, argnums=(0, 1))(feats, dv, False)
    v_s, g_s = jax.value_and_grad(loss, argnums=(0, 1))(feats, dv, True)
    np.testing.assert_allclose(np.asarray(v_s), np.asarray(v_u), rtol=1e-5)
    for gs, gu in zip(g_s, g_u):
        # Both paths sum views in the same 0..V-1 order; the looser grad
        # tolerance absorbs XLA fusion/rematerialization differences
        # between the scan and unrolled lowerings, not summation order.
        np.testing.assert_allclose(
            np.asarray(gs), np.asarray(gu), rtol=1e-3, atol=3e-5
        )


@pytest.mark.parametrize("inv_depth", [False, True])
def test_depth_regression(rng, inv_depth):
    D, H, W = 16, 6, 8
    near, far = 2.0, 6.0
    nf = np.array([near, far], dtype=np.float32)[:, None, None] * np.ones(
        (2, H, W), np.float32
    )
    dv = cost_volume.get_depth_values(jnp.array(nf), D, inv_depth)
    logits = rng.standard_normal((D, H, W)).astype(np.float32)
    prob = jax.nn.softmax(jnp.array(logits), axis=0)

    depth, ci = cost_volume.depth_regression(dv, prob, 1.0, inv_depth)
    assert depth.shape == (H, W)
    assert ci.shape == (2, H, W)
    d, c = np.asarray(depth), np.asarray(ci)
    # Depth within scene range; CI brackets the depth; CI is (near, far) ordered.
    assert (d >= near - 1e-4).all() and (d <= far + 1e-4).all()
    assert (c[0] <= d + 1e-4).all() and (c[1] >= d - 1e-4).all()
    assert (c[0] <= c[1]).all()
    assert (c[0] >= near - 1e-3).all() and (c[1] <= far + 1e-3).all()


def test_depth_regression_peaked_prob():
    """A delta probability at plane k must return depth_values[k] and a tiny CI."""
    D, H, W = 8, 2, 2
    nf = np.array([1.0, 5.0], dtype=np.float32)[:, None, None] * np.ones((2, H, W), np.float32)
    dv = cost_volume.get_depth_values(jnp.array(nf), D, False)
    prob = jnp.zeros((D, H, W)).at[3].set(1.0)
    depth, ci = cost_volume.depth_regression(dv, prob, 1.0, False)
    np.testing.assert_allclose(np.asarray(depth), np.asarray(dv[3]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(ci[0]), np.asarray(depth), atol=1e-4)
    np.testing.assert_allclose(np.asarray(ci[1]), np.asarray(depth), atol=1e-4)
