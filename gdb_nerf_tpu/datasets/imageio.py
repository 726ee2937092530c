"""Image loading helper: native C++ decode when built, cv2 otherwise.

Decode dominates host-side data time; resizing stays in cv2 where the
dataset protocol prescribes a specific filter (INTER_AREA for LLFF), so
numerical parity with the reference pipeline is preserved either way.
"""

from __future__ import annotations

import cv2
import numpy as np

from gdb_nerf_tpu.datasets import native


def load_rgb(path: str, white_bg: bool = False) -> np.ndarray:
    """Load an image as float32 RGB (H, W, 3) in [0, 1].

    white_bg composites an alpha channel over white (NeRF-synthetic).
    """
    if native.available():
        return native.decode_image(path, None, white_bg)
    if white_bg:
        img = cv2.imread(path, cv2.IMREAD_UNCHANGED).astype(np.float32) / 255.0
        img = img[..., :3] * img[..., -1:] + (1 - img[..., -1:])
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    img = cv2.imread(path, cv2.IMREAD_COLOR)
    return cv2.cvtColor(img, cv2.COLOR_BGR2RGB).astype(np.float32) / 255.0
