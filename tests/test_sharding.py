"""Multi-device tests on the virtual 8-device CPU mesh (data parallelism)."""

import numpy as np
import pytest

import jax


def test_eight_virtual_devices():
    assert jax.device_count() >= 8


def test_dryrun_multichip_entrypoint():
    """The driver's multi-chip dry run: full train step over an 8-device
    mesh with sharded batch, pmean'd grads, and synced BatchNorm."""
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_graft_entry_single():
    import __graft_entry__ as ge

    fn, (variables, batch) = ge.entry()
    out = jax.jit(fn)(variables, batch)
    assert out.shape == (1, 64, 64, 3)
    assert np.isfinite(np.asarray(out)).all()


def test_data_parallel_matches_single_device(rng):
    """One sharded step over 2 devices == one unsharded step on the same
    batch (generic correctness of pmean-grad + synced BN)."""
    import optax
    from jax.sharding import Mesh

    from gdb_nerf_tpu.models.network import Network
    from gdb_nerf_tpu.train.step import (
        init_train_state,
        make_train_step,
        to_device_train,
    )
    from tests.test_models import make_synthetic_batch

    B, H, W = 2, 64, 64
    batch = make_synthetic_batch(rng, B=B, V=2, H=H, W=W)
    batch["tar_views"]["rgb"] = batch["src_views"]["rgb"][:, 0]
    batch["tar_gt_ms"] = {"rgb": [np.zeros((B, H // 8, W // 8, 3), np.float32)]}
    dev_batch = to_device_train(batch)

    tx = optax.adam(1e-3)

    net_s = Network(mvs_num_depth=(16, 8), max_num_samples=3)
    state_s = init_train_state(net_s, tx, dev_batch, seed=0)
    step_s = make_train_step(net_s, tx, [0.05], None, use_perceptual=False)
    new_s, stats_s = step_s(state_s, dev_batch)

    net_m = Network(mvs_num_depth=(16, 8), max_num_samples=3, axis_name="data")
    mesh = Mesh(np.array(jax.devices()[:2]), ("data",))
    state_m = init_train_state(net_m, tx, dev_batch, seed=0)
    step_m = make_train_step(net_m, tx, [0.05], mesh, use_perceptual=False)
    new_m, stats_m = step_m(state_m, dev_batch)

    np.testing.assert_allclose(
        float(stats_s["loss"]), float(stats_m["loss"]), rtol=2e-4
    )
    # Parameters after one step must match closely.
    flat_s = jax.tree_util.tree_leaves(new_s.params)
    flat_m = jax.tree_util.tree_leaves(new_m.params)
    worst = max(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
        for a, b in zip(flat_s, flat_m)
    )
    assert worst < 5e-3, f"param divergence {worst}"
