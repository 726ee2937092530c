"""Inference / evaluation CLI.

Surface-equivalent of the reference run.py:
  python run.py --type dataset  --cfg_file configs/dtu_eval.yaml   # data smoke
  python run.py --type network  --cfg_file configs/dtu_eval.yaml   # fwd timing
  python run.py --type evaluate --cfg_file configs/dtu_eval.yaml   # metrics+FPS

Extra trailing `key value` pairs are dotted config overrides, e.g.
``test.eval_depth True`` or ``synthetic True`` (run on procedural data when
no dataset is on disk).  FPS follows the reference protocol: the first
iteration (compile warmup) is excluded (run.py:68-73).
"""

from __future__ import annotations

import time

import numpy as np

from gdb_nerf_tpu.config import make_cfg, make_parser


def run_dataset(cfg) -> None:
    import tqdm

    from gdb_nerf_tpu.datasets import make_data_loader

    loader = make_data_loader(cfg, is_train=False)
    for _ in tqdm.tqdm(loader):
        pass


def _build_renderer(cfg):
    import jax

    from gdb_nerf_tpu.runtime import Renderer, make_network
    from gdb_nerf_tpu.runtime.renderer import init_network
    from gdb_nerf_tpu.utils import checkpoint

    network = make_network(cfg)
    variables = init_network(network, cfg)
    try:
        variables = checkpoint.load_network(
            cfg.trained_model_dir, cfg.test.epoch, template=variables
        )
    except FileNotFoundError:
        print(
            f"[run] no checkpoint in {cfg.trained_model_dir}; "
            "using randomly initialized weights"
        )
    return Renderer(network, variables)


def run_network(cfg) -> None:
    import tqdm

    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.runtime.renderer import force_sync, force_sync_all, to_device

    renderer = _build_renderer(cfg)
    loader = make_data_loader(cfg, is_train=False)
    profiling = False
    total_time = 0.0
    n = 0
    for batch in tqdm.tqdm(loader):
        if getattr(cfg, "profile", False) and n == 1:
            # Trace post-warmup iterations; view with tensorboard or xprof.
            import jax.profiler

            jax.profiler.start_trace(cfg.record_dir)
            profiling = True
        # Host->device transfer happens OUTSIDE the timer, matching the
        # reference protocol (to_cuda before the synchronize/timer bracket,
        # /root/reference/run.py:31-40).
        dev_batch = to_device(batch)
        force_sync_all(dev_batch)  # independent transfers: sync every leaf
        start = time.time()
        renderer.render_prepared_blocking(dev_batch)
        total_time += time.time() - start
        n += 1
        if profiling and n == 4:
            import jax.profiler

            jax.profiler.stop_trace()
            profiling = False
            print(f"Profile trace written to {cfg.record_dir}")
    if profiling:
        import jax.profiler

        jax.profiler.stop_trace()
    print(f"Mean forward latency: {total_time / max(n, 1):.4f} s over {n} batches")


def run_evaluate(cfg) -> None:
    import tqdm

    from gdb_nerf_tpu.datasets import make_data_loader
    from gdb_nerf_tpu.runtime import make_evaluator
    from gdb_nerf_tpu.runtime.renderer import force_sync, force_sync_all, to_device

    renderer = _build_renderer(cfg)
    loader = make_data_loader(cfg, is_train=False)
    evaluator = make_evaluator(cfg)
    net_time = []
    for batch in tqdm.tqdm(loader):
        # Transfer outside the timer (reference: to_cuda precedes the
        # synchronize/timer bracket, /root/reference/run.py:54-66).  On the
        # tunneled dev TPU the upload RTT (~56 ms) would otherwise dominate.
        dev_batch = to_device(batch)
        force_sync_all(dev_batch)  # independent transfers: sync every leaf
        start = time.time()
        ret, _ = renderer.render_prepared_blocking(dev_batch)
        net_time.append(time.time() - start)
        output = {k: np.asarray(v) for k, v in ret.items()}
        evaluator.evaluate(output, batch)
    evaluator.summarize()
    if len(net_time) > 1:
        print("FPS: ", 1.0 / np.mean(net_time[1:]))
    else:
        print("FPS: ", 1.0 / np.mean(net_time))


def main() -> None:
    from gdb_nerf_tpu.runtime import cache

    cache.enable()
    args = make_parser().parse_args()
    cfg = make_cfg(args)
    runners = {
        "dataset": run_dataset,
        "network": run_network,
        "evaluate": run_evaluate,
    }
    if args.type not in runners:
        raise SystemExit(
            f"Unknown --type {args.type!r}; expected one of {sorted(runners)}"
        )
    runners[args.type](cfg)


if __name__ == "__main__":
    main()
