"""Evaluation: image metrics and the per-scene evaluator."""

from gdb_nerf_tpu.eval.metrics import psnr, ssim
from gdb_nerf_tpu.eval.evaluator import Evaluator
