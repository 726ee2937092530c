"""Runtime: plugin registry, device transfer, jitted renderer."""

from gdb_nerf_tpu.runtime.registry import make_network, make_evaluator
from gdb_nerf_tpu.runtime.renderer import Renderer, to_device
