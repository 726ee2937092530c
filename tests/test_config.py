"""Tests for the config system (YAML, inheritance, overrides)."""

import os

import pytest

from gdb_nerf_tpu.config import load_cfg


REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _cfg(name, opts=None):
    os.chdir(REPO)
    return load_cfg(os.path.join(REPO, "configs", name), opts)


def test_pretrain_config_values():
    cfg = _cfg("dtu_pretrain.yaml")
    assert cfg.task == "gdb_nerf"
    assert cfg.nerf.bundle_size == 2
    assert cfg.nerf.max_num_samples == 6
    assert cfg.nerf.is_adaptive is False
    assert cfg.mvs.num_depth == [64, 8]
    assert cfg.train.batch_size == 4
    assert cfg.train.scheduler.type == "exponential"
    assert cfg.train.sampler_meta.input_views_num == [2, 3, 4]


def test_parent_inheritance():
    cfg = _cfg("dtu_eval.yaml")
    # Child overrides:
    assert cfg.nerf.max_num_samples == 3
    assert cfg.nerf.is_adaptive is True
    # Inherited from parent:
    assert cfg.nerf.bundle_size == 2
    assert cfg.fpn.feat_dims == [32, 16, 8]
    assert cfg.test.sampler_meta.input_views_num == [3]


def test_dotted_overrides():
    cfg = _cfg("dtu_eval.yaml", ["test.eval_depth", "True", "nerf.max_num_samples", "5"])
    assert cfg.test.eval_depth is True
    assert cfg.nerf.max_num_samples == 5


def test_derived_dirs():
    cfg = _cfg("dtu_pretrain.yaml")
    assert cfg.trained_model_dir.endswith(
        os.path.join("trained_model", "gdb_nerf", "dtu_pretrain")
    )
    assert cfg.record_dir.endswith(os.path.join("record", "gdb_nerf", "dtu_pretrain"))


def test_odd_override_raises():
    with pytest.raises(ValueError):
        _cfg("dtu_eval.yaml", ["only_key"])


def test_llff_eval_protocol():
    cfg = _cfg("llff_eval.yaml")
    assert cfg.mvs.num_depth == [36, 8]
    assert cfg.test.eval_center is True
    assert cfg.nerf.reweighting is True
    assert cfg.test_dataset.input_h_w == [640, 960]


def test_git_placeholder_substitution():
    # reference configs/config.py:95-96: 'gitbranch'/'gitcommit' tokens in
    # exp_name resolve to the current branch / commit describe.
    cfg = _cfg("dtu_eval.yaml", ["exp_name", "'exp_gitcommit'"])
    import subprocess

    commit = subprocess.run(
        ["git", "describe", "--tags", "--always"],
        capture_output=True, text=True, cwd=REPO,
    ).stdout.strip()
    assert cfg.exp_name == f"exp_{commit}" and commit

    cfg = _cfg("dtu_eval.yaml", ["exp_name", "'e_gitbranch'"])
    assert "gitbranch" not in cfg.exp_name


def test_pretrain_warm_start_default():
    # reference dtu_pretrain.yaml:55 ships train.pretrain='pretrained'.
    cfg = _cfg("dtu_pretrain.yaml")
    assert cfg.train.pretrain == "pretrained"
