"""Optimizer and LR-schedule factories (optax).

Equivalents of the reference factories (/root/reference/train/optimizer.py,
utils/optimizer/lr_scheduler.py): adam/adamw/radam/sgd, gradient value
clipping at 40 (trainer.py:63), and the exponential / multi-step / warmup
schedules.  The reference steps its scheduler once per *epoch* with
``lr = base * gamma^(epoch / decay_epochs)`` (continuous exponent, epoch
granularity); our schedules are functions of the optimizer step, with
``ep_iter`` converting steps to epochs to keep the same trajectory.
"""

from __future__ import annotations

from typing import Any

import optax


def make_lr_schedule(cfg: Any) -> optax.Schedule:
    base = cfg.train.lr
    sched = cfg.train.scheduler
    ep_iter = max(int(getattr(cfg, "ep_iter", -1)), 1)
    stype = getattr(sched, "type", "multi_step")

    if stype == "exponential":
        gamma = sched.gamma
        decay_epochs = sched.decay_epochs

        def fn(step):
            epoch = step // ep_iter
            return base * gamma ** (epoch / decay_epochs)

        return fn
    if stype == "multi_step":
        milestones = list(sched.milestones)
        gamma = sched.gamma

        def fn(step):
            import jax.numpy as jnp

            epoch = step // ep_iter
            count = sum(
                (jnp.asarray(epoch) >= m).astype("int32") for m in milestones
            )
            return base * gamma**count

        return fn
    if stype == "warmup_multi_step":
        milestones = list(sched.milestones)
        gamma = sched.gamma
        warmup_iters = int(getattr(sched, "warmup_iters", 500))
        warmup_factor = float(getattr(sched, "warmup_factor", 1.0 / 3))

        def fn(step):
            import jax.numpy as jnp

            epoch = step // ep_iter
            e = jnp.asarray(epoch)
            count = sum((e >= m).astype("int32") for m in milestones)
            alpha = jnp.clip(step / warmup_iters, 0.0, 1.0)
            wf = jnp.where(step < warmup_iters, warmup_factor * (1 - alpha) + alpha, 1.0)
            return base * wf * gamma ** count

        return fn
    raise ValueError(f"Unknown scheduler type: {stype}")


def make_optimizer(cfg: Any) -> optax.GradientTransformation:
    """Gradient clip (value 40) -> adam/adamw/sgd with the cfg schedule."""
    schedule = make_lr_schedule(cfg)
    name = cfg.train.optim
    wd = cfg.train.weight_decay
    eps = getattr(cfg.train, "eps", 1e-8)

    if name == "adam":
        opt = (
            optax.adamw(schedule, eps=eps, weight_decay=wd)
            if wd
            else optax.adam(schedule, eps=eps)
        )
    elif name == "adamw":
        opt = optax.adamw(schedule, eps=eps, weight_decay=wd)
    elif name == "radam":
        opt = optax.radam(schedule, eps=eps)
    elif name == "sgd":
        opt = optax.sgd(schedule, momentum=0.9)
    else:
        raise ValueError(f"Unknown optimizer: {name}")

    return optax.chain(optax.clip(40.0), opt)
