"""LPIPS-VGG perceptual metric in pure JAX.

Architecture-equivalent of the `lpips.LPIPS(net='vgg')` metric the reference
evaluator uses (/root/reference/evaluators/gdb_nerf.py:21,90-95): VGG16
features at the 5 standard taps (relu1_2, relu2_2, relu3_3, relu4_3,
relu5_3), unit-normalized along channels, squared-difference, 1x1 learned
linear heads, spatial average, summed over taps.

The pretrained VGG16 + LPIPS head weights cannot be downloaded in this
environment (zero egress), so this module loads them from an `.npz`
produced by ``tools/export_lpips.py`` (run it on any machine with
torchvision + lpips installed and drop the file at
``$workspace/weights/lpips_vgg.npz``).  ``LPIPS.load_default`` raises if
the file is absent; the evaluator degrades gracefully.
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 conv plan: (taps after these relu indices), channels per block.
_VGG_PLAN = [
    (64, 2),  # conv1_1, conv1_2 -> tap relu1_2
    (128, 2),
    (256, 3),
    (512, 3),
    (512, 3),
]

_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


class LPIPS:
    def __init__(self, weights: dict):
        self.w = {k: jnp.asarray(v) for k, v in weights.items()}
        self._fn = jax.jit(self._forward)

    @classmethod
    def load_default(cls) -> "LPIPS":
        ws = os.environ.get("workspace", os.path.join(os.getcwd(), "workspace"))
        path = os.path.join(ws, "weights", "lpips_vgg.npz")
        if not os.path.exists(path):
            raise FileNotFoundError(
                f"LPIPS weights not found at {path}; "
                "generate with tools/export_lpips.py"
            )
        return cls(dict(np.load(path)))

    def _vgg_features(self, x: jax.Array) -> list[jax.Array]:
        """x: (H, W, 3) in [-1, 1] -> list of 5 tap activations."""
        h = (x - _SHIFT) / _SCALE
        h = h[None]
        taps = []
        li = 0
        for channels, n_convs in _VGG_PLAN:
            for _ in range(n_convs):
                w = self.w[f"conv{li}_w"]  # (3, 3, Cin, Cout)
                b = self.w[f"conv{li}_b"]
                h = jax.lax.conv_general_dilated(
                    h, w, (1, 1), [(1, 1), (1, 1)],
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                )
                h = jax.nn.relu(h + b)
                li += 1
            taps.append(h)
            if channels != 512 or len(taps) < 5:
                h = jax.lax.reduce_window(
                    h, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID"
                )
        return taps

    def _forward(self, a: jax.Array, b: jax.Array) -> jax.Array:
        fa = self._vgg_features(a)
        fb = self._vgg_features(b)
        total = 0.0
        for i, (xa, xb) in enumerate(zip(fa, fb)):
            na = xa / jnp.maximum(
                jnp.linalg.norm(xa, axis=-1, keepdims=True), 1e-10
            )
            nb = xb / jnp.maximum(
                jnp.linalg.norm(xb, axis=-1, keepdims=True), 1e-10
            )
            diff = jnp.square(na - nb)
            lin = self.w[f"lin{i}_w"]  # (C,) nonneg weights of the 1x1 head
            total = total + jnp.mean(jnp.sum(diff * lin, axis=-1))
        return total

    def __call__(self, a: np.ndarray, b: np.ndarray) -> float:
        """a, b: (H, W, 3) images in [-1, 1]."""
        return float(self._fn(jnp.asarray(a), jnp.asarray(b)))
