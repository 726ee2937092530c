"""The jitted (and optionally sharded) training step.

Data parallelism, the TPU way: one ``jax.sharding.Mesh`` with a ``data``
axis; the step function runs under ``shard_map`` with the batch sharded on
its leading axis and parameters replicated.  Gradients are ``pmean``-ed
across the axis (XLA lowers this to an ICI all-reduce — the DDP
equivalent), and BatchNorm runs with ``axis_name='data'`` so batch
statistics are cross-replica averaged (the SyncBatchNorm equivalent,
/root/reference/train/trainers/trainer.py:16-22).

The loss mirrors /root/reference/train/losses/gdb_nerf.py: photometric
(MSE + SSIM + VGG) color loss on the final image plus photometric losses on
each intermediate MVS stage's rendered RGB, weighted by mvs.loss_weight.
"""

from __future__ import annotations

from typing import Any, NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, PartitionSpec as P

from gdb_nerf_tpu.train import losses


class TrainState(NamedTuple):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def to_device_train(batch: dict) -> dict:
    """Device-side slice of a training batch (inputs + supervision)."""
    sv, tv = batch["src_views"], batch["tar_views"]
    out = {
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
        "tar_rgb": jnp.asarray(tv["rgb"], jnp.float32),
        "tar_gt_rgb_ms": [
            jnp.asarray(r, jnp.float32) for r in batch["tar_gt_ms"]["rgb"]
        ],
    }
    # Ground-truth depth (DTU only): carried for monitoring-only stats.
    if "depth" in batch["tar_gt_ms"]:
        out["tar_gt_depth_ms"] = [
            jnp.asarray(d, jnp.float32) for d in batch["tar_gt_ms"]["depth"]
        ]
        out["tar_gt_mask_ms"] = [
            jnp.asarray(m, jnp.float32) for m in batch["tar_gt_ms"]["mask"]
        ]
    return out


def make_loss_fn(network, loss_weight, use_perceptual: bool = True):
    weights = (1.0, 0.1, 0.05 if use_perceptual else 0.0)

    def loss_fn(params, batch_stats, batch):
        variables = {"params": params, "batch_stats": batch_stats}
        (ret, mvs_depths, blend_rgbs), updates = network.apply(
            variables,
            {
                "src_views": batch["src_views"],
                "tar_views": batch["tar_views"],
                "near_far": batch["near_far"],
            },
            train=True,
            mutable=["batch_stats"],
        )
        color_loss, mse, ssim_v, perc = losses.photometric_loss(
            batch["tar_rgb"], ret["rgb"], weights
        )
        depth_loss = 0.0
        for i, blend in enumerate(blend_rgbs):
            dl, _, _, _ = losses.photometric_loss(
                batch["tar_gt_rgb_ms"][i], blend, weights
            )
            depth_loss = depth_loss + loss_weight[i] * dl
        loss = color_loss + depth_loss
        psnr = -10.0 * jnp.log10(mse + 1e-6)
        stats = {
            "loss": loss,
            "mse_loss": mse,
            "psnr": psnr,
            "ssim": ssim_v,
            "perceptual_loss": perc,
            "depth_loss": depth_loss,
        }
        if "tar_gt_depth_ms" in batch:
            # Monitoring only (the reference computes this under no_grad:
            # train/losses/gdb_nerf.py:43-49) — depth is supervised
            # photometrically, not by ground truth.
            _, dstats = losses.smooth_l1_depth(
                [jax.lax.stop_gradient(d) for d in mvs_depths],
                batch["tar_gt_depth_ms"],
                batch["tar_gt_mask_ms"],
                [1.0] * len(mvs_depths),
            )
            stats.update(dstats)
        return loss, (updates["batch_stats"], stats)

    return loss_fn


def make_train_step(
    network,
    tx: optax.GradientTransformation,
    loss_weight,
    mesh: Optional[Mesh] = None,
    use_perceptual: bool = True,
):
    """Build the jitted train step. With a mesh, runs under shard_map with
    the batch sharded over the 'data' axis."""
    loss_fn = make_loss_fn(network, loss_weight, use_perceptual)

    def step_core(state: TrainState, batch: dict) -> tuple[TrainState, dict]:
        grad_fn = jax.value_and_grad(loss_fn, has_aux=True)
        (loss, (new_bs, stats)), grads = grad_fn(
            state.params, state.batch_stats, batch
        )
        if mesh is not None:
            grads = jax.lax.pmean(grads, "data")
            stats = jax.lax.pmean(stats, "data")
            # batch_stats already pmean-ed by BatchNorm(axis_name='data')
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        new_params = optax.apply_updates(state.params, updates)
        return (
            TrainState(new_params, new_bs, new_opt, state.step + 1),
            stats,
        )

    if mesh is None:
        return jax.jit(step_core, donate_argnums=(0,))

    sharded = jax.shard_map(
        step_core,
        mesh=mesh,
        in_specs=(P(), P("data")),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def init_train_state(network, tx, sample_batch: dict, seed: int = 0) -> TrainState:
    variables = network.init(
        jax.random.PRNGKey(seed),
        {
            "src_views": sample_batch["src_views"],
            "tar_views": sample_batch["tar_views"],
            "near_far": sample_batch["near_far"],
        },
        train=True,
    )
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    opt_state = tx.init(params)
    return TrainState(params, batch_stats, opt_state, jnp.asarray(0, jnp.int32))


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()[: num_devices or len(jax.devices())]
    return Mesh(np.array(devices), ("data",))
