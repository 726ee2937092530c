"""Host-side data pipeline: dataset readers, samplers, loader."""

from gdb_nerf_tpu.datasets.loader import make_data_loader
