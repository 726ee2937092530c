"""Multi-device execution: sharded inference and multi-host initialization."""

from gdb_nerf_tpu.parallel.infer import ShardedRenderer, make_infer_mesh
from gdb_nerf_tpu.parallel.hosts import maybe_initialize_distributed

__all__ = ["ShardedRenderer", "make_infer_mesh", "maybe_initialize_distributed"]
