"""Differential tests of grid sampling against torch.nn.functional.grid_sample.

torch (CPU) is the executable specification of the conventions the reference
pipeline relies on (align_corners=False, border/zeros padding).
"""

import numpy as np
import pytest
import torch
import torch.nn.functional as F

import jax.numpy as jnp

from gdb_nerf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_grid_sample_2d_matches_torch(rng, padding):
    H, W, C = 13, 17, 5
    N = 200
    img = rng.standard_normal((H, W, C)).astype(np.float32)
    # Include far out-of-range coordinates to exercise padding.
    grid = (rng.standard_normal((N, 2)) * 1.2).astype(np.float32)

    ours = np.asarray(grid_sample_2d(jnp.array(img), jnp.array(grid), padding))

    timg = torch.from_numpy(img).permute(2, 0, 1)[None]  # (1, C, H, W)
    tgrid = torch.from_numpy(grid)[None, :, None, :]  # (1, N, 1, 2)
    ref = F.grid_sample(
        timg, tgrid, mode="bilinear", padding_mode=padding, align_corners=False
    )
    ref = ref[0, :, :, 0].permute(1, 0).numpy()  # (N, C)

    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_grid_sample_3d_matches_torch(rng, padding):
    D, H, W, C = 7, 9, 11, 4
    N = 150
    vol = rng.standard_normal((D, H, W, C)).astype(np.float32)
    grid = (rng.standard_normal((N, 3)) * 1.2).astype(np.float32)

    ours = np.asarray(grid_sample_3d(jnp.array(vol), jnp.array(grid), padding))

    tvol = torch.from_numpy(vol).permute(3, 0, 1, 2)[None]  # (1, C, D, H, W)
    tgrid = torch.from_numpy(grid)[None, :, None, None, :]  # (1, N, 1, 1, 3)
    ref = F.grid_sample(
        tvol, tgrid, mode="bilinear", padding_mode=padding, align_corners=False
    )
    ref = ref[0, :, :, 0, 0].permute(1, 0).numpy()  # (N, C)

    np.testing.assert_allclose(ours, ref, rtol=1e-5, atol=1e-5)


def test_grid_sample_2d_batched_vmap(rng):
    import jax

    B, H, W, C, N = 3, 8, 8, 2, 20
    imgs = rng.standard_normal((B, H, W, C)).astype(np.float32)
    grids = rng.uniform(-1, 1, (B, N, 2)).astype(np.float32)
    out = jax.vmap(grid_sample_2d, in_axes=(0, 0, None))(
        jnp.array(imgs), jnp.array(grids), "border"
    )
    assert out.shape == (B, N, C)
    single = grid_sample_2d(jnp.array(imgs[1]), jnp.array(grids[1]))
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(single), rtol=1e-6)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_packed_2d_matches_unpacked(rng, padding):
    from gdb_nerf_tpu.ops.grid_sample import grid_sample_2d_packed, pack_bilinear_2d

    H, W, C = 11, 14, 5
    img = jnp.array(rng.standard_normal((H, W, C)).astype(np.float32))
    grid = jnp.array((rng.standard_normal((300, 2)) * 1.2).astype(np.float32))
    ref = grid_sample_2d(img, grid, padding)
    packed = pack_bilinear_2d(img)
    assert packed.shape == (H, W, 4 * C)
    ours = grid_sample_2d_packed(packed, grid, padding)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_packed_3d_matches_unpacked(rng, padding):
    from gdb_nerf_tpu.ops.grid_sample import grid_sample_3d_packed, pack_trilinear_3d

    D, H, W, C = 6, 9, 7, 4
    vol = jnp.array(rng.standard_normal((D, H, W, C)).astype(np.float32))
    grid = jnp.array((rng.standard_normal((250, 3)) * 1.2).astype(np.float32))
    ref = grid_sample_3d(vol, grid, padding)
    packed = pack_trilinear_3d(vol)
    assert packed.shape == (D, H, W, 8 * C)
    ours = grid_sample_3d_packed(packed, grid, padding)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_gather_patch_bilinear_matches_grid_sample(rng):
    """Shared-patch group gather == per-point bilinear when spreads fit."""
    import jax.numpy as jnp

    from gdb_nerf_tpu.ops.grid_sample import (
        gather_patch_bilinear,
        grid_sample_2d,
        pack_patch_2d,
    )

    H, W, C = 24, 30, 3
    img = jnp.asarray(rng.uniform(size=(H, W, C)).astype(np.float32))
    packed = pack_patch_2d(img, 4)

    def ref(coords):
        gx = 2.0 * (coords[..., 0] + 0.5) / W - 1.0
        gy = 2.0 * (coords[..., 1] + 0.5) / H - 1.0
        return grid_sample_2d(
            img, jnp.stack([gx, gy], -1), padding_mode="border"
        )

    # interior groups with spread <= 1.5 texels: exact (fp32 rounding only)
    centers = rng.uniform(1.0, [W - 2.0, H - 2.0], (500, 2)).astype(np.float32)
    offs = rng.uniform(-0.75, 0.75, (500, 4, 2)).astype(np.float32)
    coords = jnp.asarray(centers[:, None, :] + offs)
    np.testing.assert_allclose(
        np.asarray(gather_patch_bilinear(packed, coords, 4)),
        np.asarray(ref(coords)),
        atol=5e-6,
    )

    # groups hugging the borders: clamping matches 'border' semantics
    centers = np.array(
        [[0.2, 0.2], [W - 1.2, H - 1.2], [0.1, H - 1.1], [W - 1.05, 0.3]],
        np.float32,
    )
    offs = rng.uniform(-0.6, 0.6, (4, 4, 2)).astype(np.float32)
    coords = jnp.asarray(centers[:, None, :] + offs)
    np.testing.assert_allclose(
        np.asarray(gather_patch_bilinear(packed, coords, 4)),
        np.asarray(ref(coords)),
        atol=5e-6,
    )

    # overflowing group: values must stay within the patch's value range
    # (graceful clamp, not garbage)
    coords = jnp.asarray([[[5.0, 5.0], [15.0, 12.0], [5.5, 5.5], [6.0, 6.0]]])
    out = np.asarray(gather_patch_bilinear(packed, coords, 4))
    assert np.all(out >= float(img.min()) - 1e-6)
    assert np.all(out <= float(img.max()) + 1e-6)


@pytest.mark.parametrize("padding", ["border", "zeros"])
def test_paired_pix_matches_packed_pix(rng, padding):
    """x-parity-paired table fetch is bit-identical to the flat packed
    fetch (same taps, same tent weights — only the row layout differs)."""
    from gdb_nerf_tpu.ops.grid_sample import (
        pack_bilinear_2d,
        pack_bilinear_2d_paired,
        sample_2d_packed_pix,
        sample_2d_paired_pix,
    )

    H, W, C = 12, 16, 3
    img = jnp.array(rng.standard_normal((H, W, C)).astype(np.float32))
    x = jnp.array((rng.uniform(-2, W + 1, (400,))).astype(np.float32))
    y = jnp.array((rng.uniform(-2, H + 1, (400,))).astype(np.float32))
    ref = sample_2d_packed_pix(pack_bilinear_2d(img), x, y, padding)
    paired = pack_bilinear_2d_paired(img)
    assert paired.shape == (H, W // 2, 8 * C)
    ours = sample_2d_paired_pix(paired, x, y, padding)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))


def test_fetch_vox_paired_matches_flat(rng, monkeypatch):
    """_fetch_vox's past-the-cliff paired-table branch == the flat branch."""
    from gdb_nerf_tpu.ops import bundles

    D, H, W, C = 5, 6, 8, 4
    S = 3
    vol = jnp.array(rng.standard_normal((D, H, W, C)).astype(np.float32))
    uvd = jnp.array(
        (rng.uniform(-1.2, 1.2, (H, W, S, 3))).astype(np.float32)
    )
    samples = bundles.BundleSamples(
        z_vals=jnp.zeros((H, W, S)),
        z_metric=jnp.zeros((H, W, S)),
        valid=jnp.ones((H, W, S), bool),
        uvd=uvd,
        ball_radii=jnp.ones((H, W, S)),
        samples_per_bundle=jnp.full((H, W), S),
    )
    flat = bundles._fetch_vox(vol, samples)
    monkeypatch.setattr(bundles, "GATHER_ROW_CLIFF", 1)
    paired = bundles._fetch_vox(vol, samples)
    np.testing.assert_array_equal(np.asarray(paired), np.asarray(flat))


def test_fetch_vox_tent_matches_gather(rng, monkeypatch):
    """GDBN_VOX_TENT's zero-gather depth-tent form == the take-based
    degenerate path (same clip-floor-lerp semantics; tent weights are
    exactly (1-w, w) on the two adjacent slices and exactly 0 elsewhere)."""
    from gdb_nerf_tpu.ops import bundles

    D, H, W, C = 8, 6, 8, 4
    S = 3
    vol = jnp.array(rng.standard_normal((D, H, W, C)).astype(np.float32))
    uvd = jnp.array(
        (rng.uniform(-1.2, 1.2, (H, W, S, 3))).astype(np.float32)
    )
    samples = bundles.BundleSamples(
        z_vals=jnp.zeros((H, W, S)),
        z_metric=jnp.zeros((H, W, S)),
        valid=jnp.ones((H, W, S), bool),
        uvd=uvd,
        ball_radii=jnp.ones((H, W, S)),
        samples_per_bundle=jnp.full((H, W), S),
    )
    # Pin the ref side OFF explicitly: if GDBN_VOX_TENT=1 is in the
    # environment, module-level _VOX_TENT is already True and both sides
    # would take the tent path, making the comparison vacuous.
    monkeypatch.setattr(bundles, "_VOX_TENT", False)
    ref = bundles._fetch_vox(vol, samples)
    monkeypatch.setattr(bundles, "_VOX_TENT", True)
    tent = bundles._fetch_vox(vol, samples)
    # f32 weight arithmetic differs in the last ulp (1-(d1-zc) vs zc-d0).
    np.testing.assert_allclose(
        np.asarray(tent), np.asarray(ref), rtol=2e-6, atol=2e-6
    )
    # The packed (D, H, W*C) volume form must hit the same path.
    tent_p = bundles._fetch_vox(vol.reshape(D, H, W * C), samples, vox_channels=C)
    np.testing.assert_array_equal(np.asarray(tent_p), np.asarray(tent))
    # bf16 volume: both paths compute weights in f32 off the same zc and
    # multiply the same bf16 rows — verify the pipeline-dtype agreement
    # (tent weights cast to the volume dtype before the FMA).
    vol16 = vol.astype(jnp.bfloat16)
    monkeypatch.setattr(bundles, "_VOX_TENT", False)
    ref16 = bundles._fetch_vox(vol16, samples)
    monkeypatch.setattr(bundles, "_VOX_TENT", True)
    tent16 = bundles._fetch_vox(vol16, samples)
    np.testing.assert_allclose(
        np.asarray(tent16, np.float32),
        np.asarray(ref16, np.float32),
        rtol=1.6e-2,
        atol=1.6e-2,
    )


def test_fetch_vox_packed_matches_4d(rng, monkeypatch):
    """_fetch_vox with the lane-aligned (D, H, W*C) packed volume == the
    4D form, on both the flat and past-the-cliff paired branches."""
    from gdb_nerf_tpu.ops import bundles

    D, H, W, C = 5, 6, 8, 4
    S = 3
    vol = jnp.array(rng.standard_normal((D, H, W, C)).astype(np.float32))
    packed = vol.reshape(D, H, W * C)
    uvd = jnp.array(
        (rng.uniform(-1.2, 1.2, (H, W, S, 3))).astype(np.float32)
    )
    samples = bundles.BundleSamples(
        z_vals=jnp.zeros((H, W, S)),
        z_metric=jnp.zeros((H, W, S)),
        valid=jnp.ones((H, W, S), bool),
        uvd=uvd,
        ball_radii=jnp.ones((H, W, S)),
        samples_per_bundle=jnp.full((H, W), S),
    )
    ref = bundles._fetch_vox(vol, samples)
    got = bundles._fetch_vox(packed, samples, vox_channels=C)
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    monkeypatch.setattr(bundles, "GATHER_ROW_CLIFF", 1)
    ref_p = bundles._fetch_vox(vol, samples)
    got_p = bundles._fetch_vox(packed, samples, vox_channels=C)
    np.testing.assert_array_equal(np.asarray(got_p), np.asarray(ref_p))


def test_tent_stack_matches_pair(rng, monkeypatch):
    """GDBN_TENT=stack (one (…,4) outer-product weight consumed by a tap
    reduction — round-4 HLO-audit traffic fix) matches the pair form to
    reassociation-only error on the packed sampler and the mip fetch."""
    from gdb_nerf_tpu.ops import grid_sample as gs
    from gdb_nerf_tpu.ops import mip

    H, W, C = 12, 16, 3
    img = jnp.array(rng.standard_normal((H, W, C)).astype(np.float32))
    packed = gs.pack_bilinear_2d(img)
    x = jnp.array((rng.uniform(-2, W + 1, (300,))).astype(np.float32))
    y = jnp.array((rng.uniform(-2, H + 1, (300,))).astype(np.float32))

    feat = jnp.array(rng.standard_normal((16, 24, 7)).astype(np.float32))
    pyr, offs = mip.pack_pyramid(mip.build_pyramid(feat, 2))
    uv = jnp.array(rng.uniform(0, 1, (50, 2)).astype(np.float32))
    lod = jnp.array(rng.uniform(0, 2, (50,)).astype(np.float32))

    outs = {}
    for mode in ("pair", "stack"):
        monkeypatch.setattr(gs, "_TENT", mode)
        for pad in ("border", "zeros"):
            outs[mode, pad] = np.asarray(
                gs.sample_2d_packed_pix(packed, x, y, pad)
            )
        outs[mode, "mip"] = np.asarray(
            mip.mip_texture_fetch_packed(pyr, offs, (16, 24), uv, lod, 2)
        )
    for key in ("border", "zeros", "mip"):
        np.testing.assert_allclose(
            outs["stack", key], outs["pair", key], rtol=0, atol=1e-6
        )


def test_pack_patch_slices_matches_take_form(rng):
    from gdb_nerf_tpu.ops import grid_sample

    img = jnp.array(rng.standard_normal((9, 11, 3)).astype(np.float32))
    a = grid_sample.pack_patch_2d(img, 4)
    b = grid_sample.pack_patch_2d_slices(img, 4)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = grid_sample.pack_patch_2d(img, 6)
    d = grid_sample.pack_patch_2d_slices(img, 6)
    np.testing.assert_array_equal(np.asarray(c), np.asarray(d))


def test_gather_patch_flat_exact_when_group_fits(rng):
    from gdb_nerf_tpu.ops import grid_sample

    """When every member's bilinear footprint fits the ps x ps patch
    (group spread <= ps-2), the flat slice-FMA combine must equal the
    per-member packed 2x2 fetch exactly (same taps, same weights)."""
    H, W, C = 16, 20, 3
    img = jnp.array(rng.standard_normal((H, W, C)).astype(np.float32))
    packed6 = grid_sample.pack_patch_2d_slices(img, 6)
    packed2 = grid_sample.pack_bilinear_2d(img)
    # Groups of K=4 points with spread <= 3 px (fits ps=6), interior.
    base = rng.uniform(2.0, 12.0, (50, 1, 2)).astype(np.float32)
    off = rng.uniform(0.0, 3.0, (50, 4, 2)).astype(np.float32)
    coords = jnp.asarray(base + off)
    flat = grid_sample.gather_patch_bilinear_flat(packed6, coords, 6)
    got = np.asarray(flat).reshape(50, 4, C)
    ref = np.asarray(
        grid_sample.sample_2d_packed_pix(
            packed2, coords[..., 0], coords[..., 1], padding_mode="border"
        )
    )
    np.testing.assert_allclose(got, ref, rtol=2e-6, atol=2e-6)
    # And it must agree with the einsum patch fetch everywhere (same
    # anchor/clamp semantics, different arithmetic order).
    ein = np.asarray(grid_sample.gather_patch_bilinear(packed6, coords, 6))
    np.testing.assert_allclose(got, ein, rtol=2e-6, atol=2e-6)


def test_gather_patch_flat_overflow_clamps(rng):
    from gdb_nerf_tpu.ops import grid_sample

    """Members beyond the patch edge degrade to clamped-in-patch values
    (bounded error, no garbage) — same behavior as gather_patch_bilinear."""
    H, W, C = 12, 12, 2
    img = jnp.array(rng.standard_normal((H, W, C)).astype(np.float32))
    packed = grid_sample.pack_patch_2d_slices(img, 4)
    coords = jnp.asarray(
        np.array([[[3.0, 3.0], [9.5, 3.0], [3.0, 9.5], [9.5, 9.5]]], np.float32)
    )  # spread 6.5 px >> ps-2
    flat = np.asarray(
        grid_sample.gather_patch_bilinear_flat(packed, coords, 4)
    ).reshape(1, 4, C)
    ref = np.asarray(grid_sample.gather_patch_bilinear(packed, coords, 4))
    np.testing.assert_allclose(flat, ref, rtol=2e-6, atol=2e-6)
    assert np.all(np.isfinite(flat))
