"""Prove the checkpoint converter against the REAL reference module key space.

The full-network parity test (tests/test_full_network_parity.py) builds its
own torch replica of the reference network; if the replica's attribute names
ever drifted from the actual reference classes, that test would still pass
while the released ``latest.pth`` failed to convert.  This test closes that
gap: it imports the *actual* reference classes from
/root/reference/networks/gdb_nerf/ (network.py:14-52, depth_net.py:10-47,
cost_reg_net.py:8-118, nerf.py:6-57, decoder_rdn.py:7-81, feature_net.py:8-38)
— with their CUDA-only dependencies (nvdiffrast, nerfacc) stubbed in
sys.modules — instantiates ``Network(cfg)`` with the dtu_pretrain
hyperparameters, and asserts that ``tools/convert_checkpoint.convert``:

  1. consumes every tensor of the real ``state_dict()`` (strict=True), and
  2. produces exactly our ``Network.init`` tree, shape for shape, both
     params and batch_stats, in both directions.

If either the reference's true key space or our converter/model tree ever
drifts, this fails.
"""

from __future__ import annotations

import importlib
import importlib.machinery
import importlib.util
import os
import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")

REF = "/root/reference"

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
from convert_checkpoint import convert  # noqa: E402


def _stub(name: str, **attrs) -> types.ModuleType:
    mod = sys.modules.get(name)
    if mod is None:
        mod = types.ModuleType(name)
        sys.modules[name] = mod
    for k, v in attrs.items():
        setattr(mod, k, v)
    return mod


def _import_reference_network():
    """Import the real reference network package without running its
    CUDA-only deps or the py3.12-removed ``imp``-based plugin loader."""
    if not os.path.isdir(os.path.join(REF, "networks", "gdb_nerf")):
        pytest.skip("reference checkout not available")

    # bundle_sampler.py:4 `import nvdiffrast.torch`; utils.py:5
    # `from nerfacc.volrend import render_weight_from_alpha, accumulate_along_rays`.
    _stub("nvdiffrast")
    _stub("nvdiffrast.torch", texture=None)
    sys.modules["nvdiffrast"].torch = sys.modules["nvdiffrast.torch"]
    _stub("nerfacc")
    _stub(
        "nerfacc.volrend",
        render_weight_from_alpha=None,
        accumulate_along_rays=None,
    )

    # Mount /root/reference/networks/gdb_nerf as package 'refgdb' so the
    # relative imports inside resolve, bypassing networks/__init__.py
    # (which pulls in the removed-in-3.12 `imp` module via make_network).
    if "refgdb" not in sys.modules:
        spec = importlib.machinery.ModuleSpec("refgdb", None, is_package=True)
        pkg = importlib.util.module_from_spec(spec)
        pkg.__path__ = [os.path.join(REF, "networks", "gdb_nerf")]
        sys.modules["refgdb"] = pkg
    return importlib.import_module("refgdb.network")


def _dtu_pretrain_cfg() -> types.SimpleNamespace:
    """The dtu_pretrain hyperparameters (reference configs/dtu_pretrain.yaml:17-42)
    as the SimpleNamespace tree Network(cfg) expects."""
    ns = types.SimpleNamespace
    return ns(
        fpn=ns(base_channels=8, feat_dims=[32, 16, 8], feat_scales=[0.25, 0.5, 1.0]),
        mvs=ns(
            vol_levels=[0, 1],
            vol_scales=[0.125, 0.5],
            num_depth=[64, 8],
            inv_depth=[True, False],
            voxel_dim=8,
            ci_scales=[1.0, 1.0],
            num_samples=[8],
            loss_weight=[0.05],
        ),
        nerf=ns(
            bundle_size=2,
            global_num_depth=64,
            max_num_samples=6,
            max_mipmap_level=3,
            nerf_hidden_dims=64,
            chunk_size=1_000_000,
            is_adaptive=False,
            viewdir_agg=True,
            dec_layers=3,
            reweighting=False,
        ),
    )


def _tree_paths(tree, prefix=""):
    from collections.abc import Mapping

    out = {}
    for k, v in tree.items():
        p = f"{prefix}/{k}" if prefix else k
        if isinstance(v, Mapping):
            out.update(_tree_paths(v, p))
        else:
            out[p] = tuple(np.shape(v))
    return out


@pytest.fixture(scope="module")
def real_state_dict():
    net_mod = _import_reference_network()
    torch.manual_seed(0)
    # nn.Module defaults to training mode at construction, so DepthNet's
    # train-only stage NeRFs (depth_net.py:39-47) are built — exactly the
    # module tree the released training checkpoint was saved from.
    tnet = net_mod.Network(_dtu_pretrain_cfg())
    assert tnet.training and len(tnet.depth_net.nerfs) == 1
    return {k: v.detach().numpy() for k, v in tnet.state_dict().items()}


def test_converter_consumes_every_real_key(real_state_dict):
    # strict=True raises if any real state_dict tensor is left unmapped.
    tree = convert(dict(real_state_dict), strict=True)
    assert tree["params"] and tree["batch_stats"]


def test_converted_tree_matches_our_init_exactly(real_state_dict):
    import jax
    import jax.numpy as jnp

    from gdb_nerf_tpu.models.network import Network

    tree = convert(dict(real_state_dict), strict=True)

    network = Network(
        fpn_base_channels=8,
        fpn_feat_dims=(32, 16, 8),
        fpn_feat_scales=(0.25, 0.5, 1.0),
        mvs_vol_levels=(0, 1),
        mvs_vol_scales=(0.125, 0.5),
        mvs_ci_scales=(1.0, 1.0),
        mvs_voxel_dim=8,
        mvs_num_depth=(64, 8),
        mvs_inv_depth=(True, False),
        mvs_num_samples=(8,),
        bundle_size=2,
        global_num_depth=64,
        max_num_samples=6,
        max_mipmap_level=3,
        nerf_hidden_dims=64,
        is_adaptive=False,
        viewdir_agg=True,
        dec_layers=3,
        reweighting=False,
    )

    # Tiny spatial extent: parameter shapes are extent-independent.
    rng = np.random.default_rng(0)
    B, V, H, W = 1, 3, 32, 64
    K = np.array([[40.0, 0, W / 2], [0, 40.0, H / 2], [0, 0, 1]], np.float32)
    exts = []
    for i in range(V + 1):
        E = np.eye(4, dtype=np.float32)
        E[0, 3] = 0.1 * i
        exts.append(E)
    batch = {
        "src_views": {
            "rgb": rng.uniform(size=(B, V, H, W, 3)).astype(np.float32),
            "extrinsics": np.stack([np.stack(exts[:V])] * B),
            "intrinsics": np.stack([np.stack([K] * V)] * B),
        },
        "tar_views": {
            "extrinsics": np.stack([exts[V]] * B),
            "intrinsics": np.stack([K] * B),
        },
        "near_far": np.array([[2.0, 6.0]] * B, np.float32),
    }
    dev = jax.tree_util.tree_map(jnp.asarray, batch)
    variables = network.init(jax.random.PRNGKey(0), dev, train=True)

    init_params = _tree_paths(variables["params"])
    conv_params = _tree_paths(tree["params"])
    assert init_params == conv_params, (
        f"missing={sorted(set(init_params) - set(conv_params))[:10]} "
        f"extra={sorted(set(conv_params) - set(init_params))[:10]} "
        f"shape-mismatch={[p for p in init_params if p in conv_params and init_params[p] != conv_params[p]][:10]}"
    )
    init_stats = _tree_paths(variables["batch_stats"])
    conv_stats = _tree_paths(tree["batch_stats"])
    assert init_stats == conv_stats, (
        f"missing={sorted(set(init_stats) - set(conv_stats))[:10]} "
        f"extra={sorted(set(conv_stats) - set(init_stats))[:10]}"
    )
