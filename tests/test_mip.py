"""Tests for the mip-pyramid texture fetch (nvdiffrast replacement)."""

import numpy as np

import jax.numpy as jnp

from gdb_nerf_tpu.ops import mip


def test_pyramid_shapes(rng):
    img = jnp.array(rng.standard_normal((16, 24, 5)).astype(np.float32))
    levels = mip.build_pyramid(img, 3)
    assert [l.shape for l in levels] == [
        (16, 24, 5),
        (8, 12, 5),
        (4, 6, 5),
        (2, 3, 5),
    ]
    # Level 1 is the 2x2 box average of level 0.
    np.testing.assert_allclose(
        np.asarray(levels[1][0, 0]),
        np.asarray(img[:2, :2].mean(axis=(0, 1))),
        rtol=1e-6,
    )


def test_pyramid_batched(rng):
    img = jnp.array(rng.standard_normal((3, 8, 8, 2)).astype(np.float32))
    levels = mip.build_pyramid(img, 2)
    assert levels[2].shape == (3, 2, 2, 2)


def test_fetch_texel_centers_level0(rng):
    """At integer LOD 0 and texel centers, the fetch returns exact texels."""
    H, W, C = 8, 8, 3
    img = jnp.array(rng.standard_normal((H, W, C)).astype(np.float32))
    levels = mip.build_pyramid(img, 3)
    ys, xs = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    uv = jnp.array(
        np.stack([(xs + 0.5) / W, (ys + 0.5) / H], axis=-1), dtype=jnp.float32
    )
    lod = jnp.zeros((H, W))
    out = mip.mip_texture_fetch(levels, uv, lod, 3)
    np.testing.assert_allclose(np.asarray(out), np.asarray(img), rtol=1e-5)


def test_fetch_integer_lod_matches_level(rng):
    """At integer LOD l, the fetch equals a bilinear fetch from level l."""
    img = jnp.array(rng.standard_normal((16, 16, 2)).astype(np.float32))
    levels = mip.build_pyramid(img, 3)
    uv = jnp.array(np.random.default_rng(1).uniform(0.1, 0.9, (50, 2)), jnp.float32)
    for l in range(4):
        out = mip.mip_texture_fetch(levels, uv, jnp.full((50,), float(l)), 3)
        direct = mip._bilinear_clamp(levels[l], uv)
        np.testing.assert_allclose(np.asarray(out), np.asarray(direct), rtol=1e-5)


def test_fetch_fractional_lod_lerps(rng):
    img = jnp.array(rng.standard_normal((16, 16, 2)).astype(np.float32))
    levels = mip.build_pyramid(img, 3)
    uv = jnp.array([[0.5, 0.5]])
    a = mip.mip_texture_fetch(levels, uv, jnp.array([1.0]), 3)
    b = mip.mip_texture_fetch(levels, uv, jnp.array([2.0]), 3)
    mid = mip.mip_texture_fetch(levels, uv, jnp.array([1.5]), 3)
    np.testing.assert_allclose(np.asarray(mid), np.asarray(0.5 * (a + b)), rtol=1e-5)


def test_fetch_lod_clamped(rng):
    img = jnp.array(rng.standard_normal((8, 8, 2)).astype(np.float32))
    levels = mip.build_pyramid(img, 2)
    uv = jnp.array([[0.3, 0.7]])
    hi = mip.mip_texture_fetch(levels, uv, jnp.array([10.0]), 2)
    top = mip.mip_texture_fetch(levels, uv, jnp.array([2.0]), 2)
    np.testing.assert_allclose(np.asarray(hi), np.asarray(top), rtol=1e-6)
    lo = mip.mip_texture_fetch(levels, uv, jnp.array([-5.0]), 2)
    base = mip.mip_texture_fetch(levels, uv, jnp.array([0.0]), 2)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(base), rtol=1e-6)


def test_clamp_boundary(rng):
    """Out-of-range uv clamps to the border texel."""
    img = jnp.array(rng.standard_normal((8, 8, 2)).astype(np.float32))
    levels = mip.build_pyramid(img, 1)
    out = mip.mip_texture_fetch(levels, jnp.array([[-1.0, -1.0]]), jnp.array([0.0]), 1)
    np.testing.assert_allclose(np.asarray(out[0]), np.asarray(img[0, 0]), rtol=1e-5)


def test_packed_fetch_matches_reference_fetch(rng):
    """The 2-level packed fetch must equal the all-level tent fetch."""
    img = jnp.array(rng.standard_normal((32, 16, 5)).astype(np.float32))
    levels = mip.build_pyramid(img, 3)
    packed, offsets = mip.pack_pyramid(levels)
    r2 = np.random.default_rng(7)
    uv = jnp.array(r2.uniform(-0.2, 1.2, (400, 2)), jnp.float32)
    lod = jnp.array(r2.uniform(-1.0, 4.5, (400,)), jnp.float32)
    ref = mip.mip_texture_fetch(levels, uv, lod, 3)
    ours = mip.mip_texture_fetch_packed(packed, offsets, (32, 16), uv, lod, 3)
    np.testing.assert_allclose(np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5)


def test_l0_fetch_matches_packed_at_nonpositive_lod(rng):
    """GDBN_MIP_L0's single-tap fetch == the packed trilinear fetch for any
    lod <= 0 (clip pins the floor level to 0 with frac exactly 0), and the
    level-0-only table (what network.py packs under the flag) suffices."""
    img = jnp.array(rng.standard_normal((32, 16, 5)).astype(np.float32))
    levels = mip.build_pyramid(img, 3)
    packed, offsets = mip.pack_pyramid(levels)
    r2 = np.random.default_rng(11)
    uv = jnp.array(r2.uniform(-0.2, 1.2, (400, 2)), jnp.float32)
    lod = jnp.array(r2.uniform(-3.0, 0.0, (400,)), jnp.float32)
    ref = mip.mip_texture_fetch_packed(packed, offsets, (32, 16), uv, lod, 3)
    ours = mip.mip_texture_fetch_l0(packed, (32, 16), uv)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
    # The single-level table network.py builds under the flag hits the
    # same rows.
    packed0, _ = mip.pack_pyramid(mip.build_pyramid(img, 0))
    ours0 = mip.mip_texture_fetch_l0(packed0, (32, 16), uv)
    np.testing.assert_array_equal(np.asarray(ours0), np.asarray(ours))


def test_01_fetch_matches_packed_below_level1(rng):
    """GDBN_MIP_01's static-level-(0,1) fetch == the packed trilinear fetch
    bit-exactly for any lod < 1 (incl. negatives, where clip makes the
    ceil-tap weight exactly 0), and the 2-level table network.py packs
    under the flag suffices."""
    img = jnp.array(rng.standard_normal((32, 16, 5)).astype(np.float32))
    levels = mip.build_pyramid(img, 3)
    packed, offsets = mip.pack_pyramid(levels)
    r2 = np.random.default_rng(13)
    uv = jnp.array(r2.uniform(-0.2, 1.2, (400, 2)), jnp.float32)
    lod = jnp.array(r2.uniform(-1.5, 0.999, (400,)), jnp.float32)
    ref = mip.mip_texture_fetch_packed(packed, offsets, (32, 16), uv, lod, 3)
    ours = mip.mip_texture_fetch_01(packed, (32, 16), uv, lod)
    np.testing.assert_array_equal(np.asarray(ours), np.asarray(ref))
    # The 2-level table built under the flag hits the same rows.
    packed2, _ = mip.pack_pyramid(mip.build_pyramid(img, 1))
    ours2 = mip.mip_texture_fetch_01(packed2, (32, 16), uv, lod)
    np.testing.assert_array_equal(np.asarray(ours2), np.asarray(ours))


def test_packed_fetch_batched_vmap(rng):
    import jax

    imgs = jnp.array(rng.standard_normal((3, 8, 8, 2)).astype(np.float32))
    levels = mip.build_pyramid(imgs, 2)
    packed, offsets = mip.pack_pyramid(levels)
    uv = jnp.array(rng.uniform(0, 1, (3, 20, 2)), jnp.float32)
    lod = jnp.zeros((3, 20))
    out = jax.vmap(
        lambda p, u, l: mip.mip_texture_fetch_packed(p, offsets, (8, 8), u, l, 2)
    )(packed, uv, lod)
    assert out.shape == (3, 20, 2)


def test_build_pack_pyramid_matches_naive_chain(rng):
    """Fused dense-lane build (ops/mip.py::build_pack_pyramid) ==
    pack_pyramid(build_pyramid(concat)) — f32 to 1 ulp, bf16 to one
    rounding step (pairwise vs 4-way level averaging)."""
    feat = jnp.array(rng.uniform(0, 1, (2, 32, 48, 16)).astype(np.float32))
    rgb = jnp.array(rng.uniform(0, 1, (2, 32, 48, 3)).astype(np.float32))
    ref, off_ref = mip.pack_pyramid(
        mip.build_pyramid(jnp.concatenate([feat, rgb], axis=-1), 3)
    )
    got, off = mip.build_pack_pyramid(feat, rgb, 3)
    assert got.shape == ref.shape
    np.testing.assert_array_equal(np.asarray(off), np.asarray(off_ref))
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(ref), rtol=1e-6, atol=1e-6
    )

    fb, rb = feat.astype(jnp.bfloat16), rgb.astype(jnp.bfloat16)
    ref_b, _ = mip.pack_pyramid(
        mip.build_pyramid(jnp.concatenate([fb, rb], axis=-1), 3)
    )
    got_b, _ = mip.build_pack_pyramid(fb, rb, 3)
    np.testing.assert_allclose(
        np.asarray(got_b, np.float32),
        np.asarray(ref_b, np.float32),
        atol=8e-3,
    )


def test_build_pack_pyramid_fetch_equivalence(rng):
    """End-to-end: fetching from the fused-build table == fetching from the
    naive-chain table at random uv/lod."""
    import jax

    feat = jnp.array(rng.uniform(0, 1, (16, 24, 5)).astype(np.float32))
    rgb = jnp.array(rng.uniform(0, 1, (16, 24, 3)).astype(np.float32))
    p0, off = mip.pack_pyramid(
        mip.build_pyramid(jnp.concatenate([feat, rgb], axis=-1), 3)
    )
    p1, _ = mip.build_pack_pyramid(feat, rgb, 3)
    r2 = np.random.default_rng(11)
    uv = jnp.array(r2.uniform(-0.1, 1.1, (200, 2)), jnp.float32)
    lod = jnp.array(r2.uniform(0.0, 3.0, (200,)), jnp.float32)
    a = mip.mip_texture_fetch_packed(p0, off, (16, 24), uv, lod, 3)
    b = mip.mip_texture_fetch_packed(p1, off, (16, 24), uv, lod, 3)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6, atol=1e-6)


def test_pair_fetch_matches_reference_fetch(rng):
    """The one-row level-pair fetch (pack_pyramid_pair +
    mip_texture_fetch_pair) must equal the all-level tent fetch at random
    uv (incl. out-of-range) and lod (incl. below 0 / above max)."""
    img = jnp.array(rng.standard_normal((32, 16, 5)).astype(np.float32))
    levels = mip.build_pyramid(img, 3)
    packed, offsets = mip.pack_pyramid_pair(levels)
    assert packed.shape[-1] == 13 * 5
    r2 = np.random.default_rng(7)
    uv = jnp.array(r2.uniform(-0.2, 1.2, (400, 2)), jnp.float32)
    lod = jnp.array(r2.uniform(-1.0, 4.5, (400,)), jnp.float32)
    ref = mip.mip_texture_fetch(levels, uv, lod, 3)
    ours = mip.mip_texture_fetch_pair(packed, offsets, (32, 16), uv, lod, 3)
    np.testing.assert_allclose(
        np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-5
    )


def test_pair_fetch_exact_integer_lods(rng):
    """At integer lod the pair fetch's parent weight is frac=0 (floor
    level) — including lod == max_level, where the parent slots are zeros
    by construction; the result must still be the exact top-level bilinear."""
    img = jnp.array(rng.standard_normal((16, 16, 3)).astype(np.float32))
    levels = mip.build_pyramid(img, 2)
    packed, offsets = mip.pack_pyramid_pair(levels)
    r2 = np.random.default_rng(3)
    uv = jnp.array(r2.uniform(0.0, 1.0, (150, 2)), jnp.float32)
    for l in range(3):
        lod = jnp.full((150,), float(l))
        ref = mip.mip_texture_fetch(levels, uv, lod, 2)
        ours = mip.mip_texture_fetch_pair(packed, offsets, (16, 16), uv, lod, 2)
        np.testing.assert_allclose(
            np.asarray(ours), np.asarray(ref), rtol=1e-5, atol=1e-6
        )


def test_pair_pack_batched_vmap(rng):
    import jax

    imgs = jnp.array(rng.standard_normal((2, 3, 8, 8, 2)).astype(np.float32))
    levels = mip.build_pyramid(imgs, 2)
    packed, offsets = mip.pack_pyramid_pair(levels)
    assert packed.shape[:2] == (2, 3) and packed.shape[-1] == 26
    uv = jnp.array(rng.uniform(0, 1, (3, 20, 2)), jnp.float32)
    lod = jnp.array(rng.uniform(0, 2, (3, 20)), jnp.float32)
    out = jax.vmap(
        lambda p, u, l: mip.mip_texture_fetch_pair(p, offsets, (8, 8), u, l, 2)
    )(packed[0], uv, lod)
    ref = jax.vmap(
        lambda lv, u, l: mip.mip_texture_fetch(lv, u, l, 2)
    )([l[0] for l in levels], uv, lod)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-5, atol=1e-5
    )
