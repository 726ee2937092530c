"""A/B test: the fused Pallas BundleNeRF kernel vs the flax reference head.

Runs in Pallas interpreter mode on CPU; the same code compiles for TPU.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from gdb_nerf_tpu.models.nerf_head import BundleNeRF
from gdb_nerf_tpu.ops.pallas.fused_nerf import fused_bundle_nerf


@pytest.mark.parametrize("V", [2, 3])
def test_fused_matches_flax(rng, V):
    N, P, F4, vox_dim = 700, 31, 23, 8  # N deliberately not a tile multiple
    head = BundleNeRF(hid_dim=64, voxel_dim=vox_dim)
    vox = jnp.array(rng.standard_normal((1, N, vox_dim)).astype(np.float32))
    payload = jnp.array(rng.standard_normal((1, V, N, P)).astype(np.float32))
    frd = jnp.array(rng.standard_normal((1, V, N, F4)).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), vox, payload, frd)

    sigma_ref, feat_ref = head.apply(variables, vox, payload, frd)
    sigma, feat = fused_bundle_nerf(
        variables["params"], vox[0], payload[0], frd[0], interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(sigma), np.asarray(sigma_ref[0]), rtol=1e-4, atol=1e-5
    )
    np.testing.assert_allclose(
        np.asarray(feat), np.asarray(feat_ref[0]), rtol=1e-4, atol=1e-4
    )


def test_fused_handles_exact_tile_multiple(rng):
    from gdb_nerf_tpu.ops.pallas.fused_nerf import TILE

    N, P, F4, vox_dim, V = TILE * 2, 31, 23, 8, 3
    head = BundleNeRF(hid_dim=64, voxel_dim=vox_dim)
    vox = jnp.array(rng.standard_normal((1, N, vox_dim)).astype(np.float32))
    payload = jnp.array(rng.standard_normal((1, V, N, P)).astype(np.float32))
    frd = jnp.array(rng.standard_normal((1, V, N, F4)).astype(np.float32))
    variables = head.init(jax.random.PRNGKey(0), vox, payload, frd)
    sigma_ref, feat_ref = head.apply(variables, vox, payload, frd)
    sigma, feat = fused_bundle_nerf(
        variables["params"], vox[0], payload[0], frd[0], interpret=True
    )
    np.testing.assert_allclose(
        np.asarray(sigma), np.asarray(sigma_ref[0]), rtol=1e-4, atol=1e-5
    )


def test_network_pallas_path_matches_flax_path(rng):
    """Full Network forward with use_pallas=True equals the flax path."""
    from gdb_nerf_tpu.models.network import Network
    from tests.test_models import make_synthetic_batch

    batch = make_synthetic_batch(rng, B=1, V=2, H=64, W=64)
    kw = dict(mvs_num_depth=(16, 8), max_num_samples=3)
    net_ref = Network(**kw)
    variables = net_ref.init(jax.random.PRNGKey(0), batch, train=False)
    ret_ref, _, _ = net_ref.apply(variables, batch, train=False)

    net_pl = Network(use_pallas=True, **kw)
    ret_pl, _, _ = net_pl.apply(variables, batch, train=False)
    np.testing.assert_allclose(
        np.asarray(ret_pl["rgb"]), np.asarray(ret_ref["rgb"]), rtol=1e-4, atol=1e-4
    )
    np.testing.assert_allclose(
        np.asarray(ret_pl["nerf_depth"]),
        np.asarray(ret_ref["nerf_depth"]),
        rtol=1e-4,
        atol=1e-3,
    )
