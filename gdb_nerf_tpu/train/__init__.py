"""Training: losses, optimization, train step, trainer loop, recorder."""

from gdb_nerf_tpu.train.optim import make_optimizer, make_lr_schedule
from gdb_nerf_tpu.train.losses import photometric_loss, ssim as ssim_train
