"""Trainer: the epoch/iteration loop around the jitted train step.

Equivalent of /root/reference/train/trainers/trainer.py: per-iteration
device transfer -> train step -> smoothed logging with eta/lr/memory; a
``val`` loop running the evaluator; checkpoint save hooks are driven by
train_net.py.  Multi-device data parallelism comes from the mesh passed to
``make_train_step`` — no process groups, no DDP wrapper.
"""

from __future__ import annotations

import datetime
import time
from typing import Any, Optional

import jax
import numpy as np

from gdb_nerf_tpu.train.optim import make_lr_schedule
from gdb_nerf_tpu.train.step import (
    TrainState,
    init_train_state,
    make_mesh,
    make_train_step,
    to_device_train,
)


class Trainer:
    def __init__(self, cfg, network, tx, mesh=None, use_perceptual=True):
        self.cfg = cfg
        self.network = network
        self.tx = tx
        self.mesh = mesh
        self.schedule = make_lr_schedule(cfg)
        self.step_fn = make_train_step(
            network, tx, list(cfg.mvs.loss_weight), mesh, use_perceptual
        )
        self.state: Optional[TrainState] = None

    def ensure_state(self, sample_batch: dict) -> TrainState:
        if self.state is None:
            self.state = init_train_state(
                self.network, self.tx, to_device_train(sample_batch)
            )
        return self.state

    def train_epoch(self, epoch: int, data_loader, recorder) -> None:
        max_iter = len(data_loader)
        end = time.time()
        for it, batch in enumerate(data_loader):
            data_time = time.time() - end
            dev_batch = to_device_train(batch)
            self.ensure_state(batch)
            self.state, stats = self.step_fn(self.state, dev_batch)
            stats = jax.device_get(stats)
            batch_time = time.time() - end
            end = time.time()

            recorder.step += 1
            recorder.update_loss_stats(stats)
            recorder.batch_time.update(batch_time)
            recorder.data_time.update(data_time)

            if it % self.cfg.log_interval == 0 or it == max_iter - 1:
                lr = float(self.schedule(int(self.state.step)))
                eta_seconds = recorder.batch_time.global_avg * (max_iter - it)
                eta = str(datetime.timedelta(seconds=int(eta_seconds)))
                mem = _device_memory_mb()
                print(
                    f"eta: {eta}  epoch: {epoch}  iter {it}/{max_iter}  "
                    f"{recorder}  lr: {lr:.6f}  "
                    f"data: {recorder.data_time.avg:.3f}s  "
                    f"batch: {recorder.batch_time.avg:.3f}s  max_mem: {mem}"
                )
            if it % self.cfg.log_interval == 0:
                recorder.record("train")

    def val(self, epoch: int, data_loader, evaluator, recorder=None) -> None:
        from gdb_nerf_tpu.runtime import Renderer

        variables = {
            "params": self.state.params,
            "batch_stats": self.state.batch_stats,
        }
        renderer = Renderer(self.network, variables)
        image_stats = {}
        for batch in data_loader:
            ret, _ = renderer.render_blocking(batch)
            output = {k: np.asarray(v) for k, v in ret.items()}
            evaluator.evaluate(output, batch)
            if not image_stats:  # pred/gt/depth panel from the first batch
                image_stats = {
                    "pred_rgb": output["rgb"],
                    "gt_rgb": np.asarray(batch["tar_views"]["rgb"]),
                    "nerf_depth": output["nerf_depth"],
                }
        result = evaluator.summarize()
        if recorder is not None:
            recorder.record("val", epoch, result, image_stats, batched=True)


def _device_memory_mb() -> str:
    try:
        stats = jax.local_devices()[0].memory_stats()
        return f"{stats['peak_bytes_in_use'] / 2**20:.0f}MB"
    except Exception:
        return "n/a"
