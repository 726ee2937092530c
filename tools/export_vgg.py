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


def main(out_path: str, random_init: bool = False) -> None:
    import torchvision

    # --random: export a randomly-initialized VGG16 — structurally identical
    # weights for exercising the perceptual code path end to end on
    # no-egress machines (metric values are then NOT protocol-comparable).
    weights = None if random_init else "DEFAULT"
    vgg = torchvision.models.vgg16(weights=weights).features[:23].eval()
    out = export_state_dict(vgg)
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    np.savez(out_path, **out)
    kind = "RANDOM-INIT" if random_init else "pretrained"
    print(f"wrote {out_path} with {len(out)} arrays ({kind})")


if __name__ == "__main__":
    argv = [a for a in sys.argv[1:] if a != "--random"]
    main(argv[0], random_init="--random" in sys.argv)
