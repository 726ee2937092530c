"""Tests for checkpoint save/load including optax state round-trips."""

import os

import numpy as np
import optax
import pytest

import jax.numpy as jnp

from gdb_nerf_tpu.utils import checkpoint


def _fake_state():
    params = {"layer": {"kernel": jnp.ones((3, 3)), "bias": jnp.zeros(3)}}
    tx = optax.chain(optax.clip(40.0), optax.adam(1e-3))
    opt_state = tx.init(params)
    return {
        "net": {"params": params, "batch_stats": {"bn": {"mean": jnp.zeros(3)}}},
        "optim": opt_state,
        "recorder": {"step": 17},
        "step": 42,
    }, tx


def test_save_load_roundtrip(tmp_path):
    state, tx = _fake_state()
    d = str(tmp_path / "model")
    checkpoint.save_model(state, d, epoch=3)
    checkpoint.save_model(state, d, epoch=3, last=True)
    assert sorted(os.listdir(d)) == ["3.ckpt", "latest.ckpt"]

    raw, begin = checkpoint.load_model(
        d, templates={"net": state["net"], "optim": state["optim"]}
    )
    assert begin == 4
    np.testing.assert_allclose(
        np.asarray(raw["net"]["params"]["layer"]["kernel"]), np.ones((3, 3))
    )
    # optax state restored with original structure (tuple of namedtuples)
    assert type(raw["optim"]) is type(state["optim"])
    assert raw["recorder"]["step"] == 17


def test_load_network_latest_and_epoch(tmp_path):
    state, _ = _fake_state()
    d = str(tmp_path / "model")
    checkpoint.save_model(state, d, epoch=1)
    checkpoint.save_model(state, d, epoch=5)
    net = checkpoint.load_network(d, template=state["net"])
    np.testing.assert_allclose(
        np.asarray(net["params"]["layer"]["bias"]), np.zeros(3)
    )
    net = checkpoint.load_network(d, epoch=1, template=state["net"])
    assert net is not None


def test_load_missing_dir_raises(tmp_path):
    with pytest.raises(FileNotFoundError):
        checkpoint.load_network(str(tmp_path / "nope"))


def test_resume_false_wipes(tmp_path):
    state, _ = _fake_state()
    d = str(tmp_path / "model")
    checkpoint.save_model(state, d, epoch=1)
    raw, begin = checkpoint.load_model(d, resume=False)
    assert raw is None and begin == 0
    assert not os.path.exists(d)
