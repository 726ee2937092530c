"""Jitted inference renderer + host->device batch transfer.

``to_device`` is the `to_cuda` analog (/root/reference/utils/data_utils.py:
579-596): it moves the network-input slice of a batch to the accelerator,
skipping host-only fields (meta, ground truth).  ``Renderer`` wraps a
Network + params with a jit cache keyed by input shapes — the source-view
count varies in {2,3,4}, so at most a handful of executables exist.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import numpy as np


def to_device(batch: dict) -> dict:
    """Extract and transfer the device-side slice of a data batch."""
    sv = batch["src_views"]
    tv = batch["tar_views"]
    dev = {
        "src_views": {
            "rgb": jnp.asarray(sv["rgb"], jnp.float32),
            "extrinsics": jnp.asarray(sv["extrinsics"], jnp.float32),
            "intrinsics": jnp.asarray(sv["intrinsics"], jnp.float32),
        },
        "tar_views": {
            "extrinsics": jnp.asarray(tv["extrinsics"], jnp.float32),
            "intrinsics": jnp.asarray(tv["intrinsics"], jnp.float32),
        },
        "near_far": jnp.asarray(batch["near_far"], jnp.float32),
    }
    return dev


def force_sync(tree) -> None:
    """Truly wait for device results by reading one element to the host.

    On the tunneled TPU platform used here, ``jax.block_until_ready`` can
    return before execution finishes (dispatch-only), which silently turns
    latency measurements into dispatch measurements.  A host read of any
    element cannot complete until the producing computation has run, so
    this is the honest synchronization primitive for timing.  One leaf
    suffices: the outputs of a single jitted executable complete together,
    and each read costs a full tunnel round trip (~56 ms), so reading every
    leaf would multiply the RTT into the measurement.
    """
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf[(0,) * leaf.ndim])
            return


def force_sync_all(tree) -> None:
    """force_sync for trees of INDEPENDENT arrays (e.g. a just-transferred
    batch): reads one element of EVERY leaf.  Independent host->device
    transfers have no shared completion event, so the one-leaf shortcut of
    ``force_sync`` does not cover them.  Each read costs a tunnel RTT —
    use outside timed regions only."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "ndim"):
            np.asarray(leaf[(0,) * leaf.ndim])


class Renderer:
    """Holds (network, variables) and runs jit-compiled eval forwards."""

    def __init__(self, network, variables):
        self.network = network
        self.variables = variables
        self._apply = jax.jit(
            lambda v, b: network.apply(v, b, train=False)
        )

    def render(self, batch: dict):
        """Run one eval forward; returns the ret dict as numpy arrays."""
        dev_batch = to_device(batch)
        ret, mvs_depths, _ = self._apply(self.variables, dev_batch)
        return ret, mvs_depths

    def render_blocking(self, batch: dict):
        """Like render(), but genuinely blocks until device work completes."""
        ret, mvs_depths = self.render(batch)
        force_sync(ret)
        return ret, mvs_depths

    def render_prepared(self, dev_batch: dict):
        """Forward on an already-transferred batch (see ``to_device``).

        Use with the FPS timing protocol: transfer outside the timer, like
        the reference's to_cuda-then-synchronize bracket
        (/root/reference/run.py:54-66).
        """
        ret, mvs_depths, _ = self._apply(self.variables, dev_batch)
        return ret, mvs_depths

    def render_prepared_blocking(self, dev_batch: dict):
        ret, mvs_depths = self.render_prepared(dev_batch)
        force_sync(ret)
        return ret, mvs_depths


def init_network(network, cfg, seed: int = 0, sample_batch: dict | None = None):
    """Initialize network variables from a sample batch (or a synthetic one)."""
    if sample_batch is None:
        V = (
            cfg.test.sampler_meta.input_views_num[0]
            if cfg.test.sampler_meta.input_views_num
            else 3
        )
        H, W = 64, 64
        K = np.array([[2 * W, 0, W / 2], [0, 2 * W, H / 2], [0, 0, 1]], np.float32)
        ext = np.eye(4, dtype=np.float32)
        ext[2, 3] = 4.0
        sample_batch = {
            "src_views": {
                "rgb": np.zeros((1, V, H, W, 3), np.float32),
                "extrinsics": np.stack([np.stack([ext] * V)]),
                "intrinsics": np.stack([np.stack([K] * V)]),
            },
            "tar_views": {
                "extrinsics": ext[None],
                "intrinsics": K[None],
            },
            "near_far": np.array([[2.5, 6.0]], np.float32),
        }
    dev = to_device(sample_batch)
    return network.init(jax.random.PRNGKey(seed), dev, train=False)
