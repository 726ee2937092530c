"""Sharded single-image inference over a device mesh.

The reference has no multi-GPU inference; its parallelism is training-only
DDP (/root/reference/train/trainers/trainer.py:13-22).  On TPU the natural
way to put N chips behind ONE render (SURVEY §2.7: "shard rays/bundles
across devices ... embarrassingly parallel over image tiles") is GSPMD: the
network's bundle-grid stages (sampling, per-sample encoding, the NeRF head,
compositing) carry `with_sharding_constraint` row-tile annotations
(models/network.py, `spatial_axis`), so under a jit with a 1-D `data` mesh
XLA partitions those stages across devices and inserts the single
all_gather needed before the decoder's spatial convolutions.  No
collectives are written by hand; shardings ride ICI.

The MVS stages (FPN, plane-sweep warps, 3D U-Nets) and the RDN decoder have
cross-row receptive fields and stay replicated — they are a minority of the
frame (tools/profile_forward.py), so the sharding targets where the
milliseconds are.
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from gdb_nerf_tpu.runtime.renderer import force_sync, to_device


def make_infer_mesh(num_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the local devices, axis name 'data'."""
    devices = jax.devices()[: num_devices or len(jax.devices())]
    return Mesh(np.array(devices), ("data",))


class ShardedRenderer:
    """Renders one view with the bundle stages sharded over image-row tiles.

    Drop-in sibling of runtime.Renderer: same (network, variables) inputs,
    same render()/render_blocking() surface.  Requires the bundle-grid
    height (H / bundle_size) to be divisible by the mesh size.
    """

    def __init__(self, network, variables, mesh: Optional[Mesh] = None):
        self.mesh = mesh or make_infer_mesh()
        self.network = dataclasses.replace(network, spatial_axis="data")
        replicated = NamedSharding(self.mesh, P())
        self.variables = jax.device_put(variables, replicated)
        net = self.network
        self._apply = jax.jit(
            lambda v, b: net.apply(v, b, train=False),
            out_shardings=replicated,
        )

    def render(self, batch: dict):
        dev = jax.device_put(to_device(batch), NamedSharding(self.mesh, P()))
        with self.mesh:
            ret, mvs_depths, _ = self._apply(self.variables, dev)
        return ret, mvs_depths

    def render_blocking(self, batch: dict):
        ret, mvs_depths = self.render(batch)
        force_sync(ret)
        return ret, mvs_depths
