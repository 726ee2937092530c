"""Plugin registry mapping reference-style module strings to factories.

The reference resolves YAML keys like ``network_module:
networks.gdb_nerf.network`` through ``imp.load_source``
(/root/reference/networks/make_network.py).  We keep the same YAML surface
but resolve through an explicit registry — users can register their own
constructors with ``register``.
"""

from __future__ import annotations

from typing import Any, Callable

_NETWORKS: dict[str, Callable] = {}
_EVALUATORS: dict[str, Callable] = {}
_LOSSES: dict[str, Callable] = {}


def register(kind: str, name: str, factory: Callable) -> None:
    {"network": _NETWORKS, "evaluator": _EVALUATORS, "loss": _LOSSES}[kind][
        name
    ] = factory


def _default_network(cfg: Any):
    from gdb_nerf_tpu.models.network import Network

    return Network.from_config(cfg)


def make_network(cfg: Any):
    name = getattr(cfg, "network_module", "networks.gdb_nerf.network")
    factory = _NETWORKS.get(name, _default_network)
    return factory(cfg)


def make_evaluator(cfg: Any):
    name = getattr(cfg, "evaluator_module", "evaluators.gdb_nerf")
    if name in _EVALUATORS:
        return _EVALUATORS[name](cfg)
    from gdb_nerf_tpu.eval.evaluator import Evaluator

    return Evaluator(cfg)


def make_loss(cfg: Any, network):
    """Resolve the loss function for ``network`` from the config.

    The default (the reference's NetworkWrapper,
    /root/reference/train/losses/gdb_nerf.py) is the photometric +
    staged-depth loss built by ``train.step.make_loss_fn``; custom losses
    register under their ``loss_module`` string.
    """
    name = getattr(cfg, "loss_module", "train.losses.gdb_nerf")
    if name in _LOSSES:
        return _LOSSES[name](cfg, network)
    from gdb_nerf_tpu.train.step import make_loss_fn

    return make_loss_fn(network, tuple(cfg.mvs.loss_weight))
