"""Export torchvision VGG16 conv weights to npz for the perceptual loss.

The training loss's gamma-weighted perceptual term
(/root/reference/train/losses/vgg_perceptual_loss.py:5-45, weights [1.0,
0.1, 0.05] in photometric_loss.py:7-21) needs the pretrained VGG16 features
[:23] — the first 10 convs (blocks 2+2+3+3).  This environment has no
network egress, so run this exporter on any machine with torchvision and
its weight cache, then drop the file at ``$workspace/weights/vgg16.npz``.

Usage:  python tools/export_vgg.py $workspace/weights/vgg16.npz

Keys match gdb_nerf_tpu.train.losses._vgg_weights: ``conv{i}_w`` in HWIO
layout and ``conv{i}_b`` for i in 0..9.
"""

from __future__ import annotations

import os
import sys

import numpy as np


def export_state_dict(features) -> dict:
    """Collect conv weights (HWIO) + biases from a VGG16 ``features[:23]``."""
    import torch.nn as nn

    out = {}
    li = 0
    for layer in features:
        if isinstance(layer, nn.Conv2d):
            out[f"conv{li}_w"] = (
                layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            )
            out[f"conv{li}_b"] = layer.bias.detach().numpy()
            li += 1
    assert li == 10, f"expected 10 convs in VGG16 features[:23], got {li}"
    return out


# VGG16 features[:23] conv shapes: blocks 2+2+3+3 (torchvision vgg16 cfg "D").
_VGG16_CONV_CHANNELS = [
    (3, 64), (64, 64), (64, 128), (128, 128),
    (128, 256), (256, 256), (256, 256),
    (256, 512), (512, 512), (512, 512),
]


def random_state_dict(seed: int = 0) -> dict:
    """Structurally-identical random VGG16 weights, no torchvision needed."""
    rng = np.random.default_rng(seed)
    out = {}
    for i, (ci, co) in enumerate(_VGG16_CONV_CHANNELS):
        fan_in = 9 * ci
        out[f"conv{i}_w"] = rng.normal(
            0.0, np.sqrt(2.0 / fan_in), (3, 3, ci, co)
        ).astype(np.float32)
        out[f"conv{i}_b"] = np.zeros(co, np.float32)
    return out


def main(out_path: str, random_init: bool = False) -> None:
    # --random: export a randomly-initialized VGG16 — structurally identical
    # weights for exercising the perceptual code path end to end on
    # no-egress machines (metric values are then NOT protocol-comparable).
    if random_init:
        out = random_state_dict()
    else:
        import torchvision

        vgg = torchvision.models.vgg16(weights="DEFAULT").features[:23].eval()
        out = export_state_dict(vgg)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, **out)
    kind = "RANDOM-INIT" if random_init else "pretrained"
    print(f"wrote {out_path} with {len(out)} arrays ({kind})")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--random"]
    main(argv[0], random_init="--random" in sys.argv)
