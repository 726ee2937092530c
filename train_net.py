"""Training CLI.

Surface-equivalent of the reference train_net.py:
  python train_net.py --cfg_file configs/dtu_pretrain.yaml [k v ...]
  python train_net.py --cfg_file configs/dtu_pretrain.yaml --test   # eval only

Data parallelism is automatic: all local JAX devices form a 1-D mesh over
the ``data`` axis, the batch is sharded across it and gradients/BN stats
are all-reduced by XLA (no NCCL process groups; for multi-host, run one
process per host with jax.distributed.initialize() before invoking).
"""

from __future__ import annotations

import numpy as np

from gdb_nerf_tpu.config import make_cfg, make_parser


def train(cfg) -> None:
    import jax

    # Multi-host: the jax.distributed equivalent of the reference's NCCL
    # init_process_group (train_net.py:107-111).  No-op without coordinator
    # env vars (JAX_COORDINATOR_ADDRESS, or torchrun-style MASTER_ADDR +
    # WORLD_SIZE/RANK); must run before any other jax call.
    from gdb_nerf_tpu.parallel import maybe_initialize_distributed

    maybe_initialize_distributed()

    # bf16-truncated matmuls destabilize training on TPU (verified: loss
    # spikes at ~iter 60 that CPU runs never show); pin full precision.
    jax.config.update(
        "jax_default_matmul_precision",
        getattr(cfg, "train_matmul_precision", "highest"),
    )

    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.models.network import Network
    from gdb_nerf_tpu.runtime import make_evaluator
    from gdb_nerf_tpu.train.optim import make_optimizer
    from gdb_nerf_tpu.train.recorder import Recorder
    from gdb_nerf_tpu.train.step import make_mesh
    from gdb_nerf_tpu.train.trainer import Trainer
    from gdb_nerf_tpu.utils import checkpoint

    n_dev = jax.local_device_count()
    use_mesh = n_dev > 1 and cfg.train.batch_size % n_dev == 0
    mesh = make_mesh() if use_mesh else None
    if use_mesh:
        print(f"Data-parallel over {n_dev} devices")
    network = Network.from_config(cfg, axis_name="data" if use_mesh else None)

    tx = make_optimizer(cfg)
    trainer = Trainer(cfg, network, tx, mesh)
    recorder = Recorder(cfg, enabled=jax.process_index() == 0)
    evaluator = make_evaluator(cfg) if not cfg.skip_eval else None

    train_loader = make_data_loader(
        cfg,
        is_train=True,
        max_iter=cfg.ep_iter,
        num_shards=jax.process_count(),
        shard_id=jax.process_index(),
    )
    val_loader = make_data_loader(cfg, is_train=False)

    # Resume / warm start.
    first_batch = next(iter(train_loader))
    trainer.ensure_state(first_batch)
    state_raw, begin_epoch = checkpoint.load_model(
        cfg.trained_model_dir,
        resume=cfg.resume,
        templates={
            "net": {
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
            "optim": trainer.state.opt_state,
        },
    )
    if state_raw is not None:
        from gdb_nerf_tpu.train.step import TrainState
        import jax.numpy as jnp

        net = state_raw["net"]
        # Older checkpoints lack an explicit step counter; reconstruct it
        # from the epoch.  ep_iter defaults to -1 ("whole dataset"), in
        # which case the per-epoch iteration count is the loader length.
        ep_steps = cfg.ep_iter if cfg.ep_iter > 0 else len(train_loader)
        trainer.state = TrainState(
            net["params"],
            net["batch_stats"],
            state_raw["optim"],
            jnp.asarray(
                state_raw.get("step", max(begin_epoch, 0) * ep_steps), jnp.int32
            ),
        )
        recorder.load_state_dict(state_raw.get("recorder", {}))
    elif cfg.train.pretrain:
        pre = checkpoint.load_pretrain(
            cfg,
            template={
                "params": trainer.state.params,
                "batch_stats": trainer.state.batch_stats,
            },
        )
        if pre is not None:
            from gdb_nerf_tpu.train.step import TrainState

            trainer.state = TrainState(
                pre["params"],
                pre["batch_stats"],
                trainer.state.opt_state,
                trainer.state.step,
            )

    for epoch in range(begin_epoch, cfg.train.epoch):
        recorder.epoch = epoch
        if hasattr(train_loader.batch_sampler, "set_epoch"):
            train_loader.batch_sampler.set_epoch(epoch)
        trainer.train_epoch(epoch, train_loader, recorder)

        if jax.process_index() == 0:
            state = {
                "net": {
                    "params": trainer.state.params,
                    "batch_stats": trainer.state.batch_stats,
                },
                "optim": trainer.state.opt_state,
                "recorder": recorder.state_dict(),
                "step": int(trainer.state.step),
            }
            if (epoch + 1) % cfg.save_ep == 0:
                checkpoint.save_model(state, cfg.trained_model_dir, epoch)
            if (epoch + 1) % cfg.save_latest_ep == 0:
                checkpoint.save_model(state, cfg.trained_model_dir, epoch, last=True)

        if evaluator is not None and (epoch + 1) % cfg.eval_ep == 0:
            if jax.process_index() == 0:
                trainer.val(epoch, val_loader, evaluator, recorder)


def test(cfg) -> None:
    import run as run_cli

    run_cli.run_evaluate(cfg)


def main() -> None:
    from gdb_nerf_tpu.runtime import cache

    cache.enable()
    args = make_parser().parse_args()
    cfg = make_cfg(args)
    if cfg.fix_random:
        # Reference seeds python/numpy/torch (train_net.py:18-23).  Our
        # equivalents: python+numpy here; dataset/sampler Generators are
        # seeded by the loader factory from cfg.fix_random; traced RNG is
        # jax.random with fixed keys already.
        import random

        random.seed(0)
        np.random.seed(0)
    if args.test:
        test(cfg)
    else:
        train(cfg)


if __name__ == "__main__":
    main()
