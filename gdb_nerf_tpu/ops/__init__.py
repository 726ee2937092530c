"""Pure-function geometry / sampling / rendering ops (jit-safe, static shapes)."""

from gdb_nerf_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d
from gdb_nerf_tpu.ops import camera, cost_volume, bundles, mip, render
