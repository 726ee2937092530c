"""Multi-host initialization — the NCCL process-group equivalent.

The reference bootstraps multi-node training with
``torch.distributed.init_process_group(backend="nccl", init_method="env://")``
driven by RANK/WORLD_SIZE env vars (/root/reference/train_net.py:107-111).
The JAX equivalent is one ``jax.distributed.initialize()`` per host; after
it, ``jax.devices()`` spans the whole slice, ``jax.process_index()`` /
``jax.process_count()`` identify this host, and the existing mesh +
shard_map train step works unchanged — XLA routes the gradient psum over
ICI/DCN.  The per-host input pipeline shards the dataset with
``ShardedSampler`` via the ``num_shards``/``shard_id`` the loader factory
already takes from process_count/process_index (train_net.py).

Recognized env conventions (first match wins):
  * JAX-native: ``JAX_COORDINATOR_ADDRESS`` (+ optional ``JAX_NUM_PROCESSES``,
    ``JAX_PROCESS_ID``) — explicit, works anywhere.
  * torchrun-style: ``MASTER_ADDR``/``MASTER_PORT`` + ``WORLD_SIZE``/``RANK``
    — so reference-style launch scripts keep working.
  * Cloud TPU pods: no env needed; ``jax.distributed.initialize()`` with no
    args autodetects when more than one process exists.
"""

from __future__ import annotations

import os


def config_from_env(env=None) -> dict | None:
    """Parse the coordinator config from env vars; None = single-host."""
    env = os.environ if env is None else env
    if env.get("JAX_COORDINATOR_ADDRESS"):
        kwargs = dict(coordinator_address=env["JAX_COORDINATOR_ADDRESS"])
        if env.get("JAX_NUM_PROCESSES"):
            kwargs["num_processes"] = int(env["JAX_NUM_PROCESSES"])
        if env.get("JAX_PROCESS_ID"):
            kwargs["process_id"] = int(env["JAX_PROCESS_ID"])
        return kwargs
    if env.get("MASTER_ADDR") and env.get("WORLD_SIZE"):
        # torchrun-style launch (reference train_net.py used env://).
        if int(env["WORLD_SIZE"]) <= 1:
            return None
        return dict(
            coordinator_address=(
                f"{env['MASTER_ADDR']}:{env.get('MASTER_PORT', '12355')}"
            ),
            num_processes=int(env["WORLD_SIZE"]),
            process_id=int(env.get("RANK", "0")),
        )
    # Cloud TPU pod slice: the TPU runtime exports the worker list; more
    # than one worker means jax.distributed.initialize() with NO args will
    # autodetect coordinator/process_id from the TPU metadata.  {} is the
    # "autodetect" sentinel consumed by maybe_initialize_distributed.
    workers = env.get("TPU_WORKER_HOSTNAMES", "")
    if len([w for w in workers.split(",") if w.strip()]) > 1:
        return {}
    return None


def maybe_initialize_distributed(verbose: bool = True) -> bool:
    """Initialize jax.distributed from env vars when present.

    Returns True if multi-host init ran (or was already done), False for
    plain single-host runs.  Safe to call unconditionally from CLIs.
    """
    import jax

    if getattr(maybe_initialize_distributed, "_done", False):
        return True

    kwargs = config_from_env()
    if kwargs is None:
        return False

    jax.distributed.initialize(**kwargs)
    maybe_initialize_distributed._done = True
    if verbose and jax.process_index() == 0:
        print(
            f"[parallel] multi-host initialized: {jax.process_count()} processes, "
            f"{jax.device_count()} devices total"
        )
    return True
