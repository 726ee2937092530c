"""Flax model components of the GDB-NeRF-TPU network."""

from gdb_nerf_tpu.models.feature_net import FeatureNet
from gdb_nerf_tpu.models.cost_reg_net import CostRegNet, CostRegNetSmall
from gdb_nerf_tpu.models.nerf_head import BundleNeRF, StageNeRF
from gdb_nerf_tpu.models.decoder_rdn import Decoder
from gdb_nerf_tpu.models.depth_net import DepthNet
from gdb_nerf_tpu.models.network import Network
