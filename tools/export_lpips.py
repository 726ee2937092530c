"""Export LPIPS-VGG weights to npz for the JAX metric (run where torchvision
and lpips are installed; this environment has no network egress).

Usage:  python tools/export_lpips.py $workspace/weights/lpips_vgg.npz
"""

import sys

import numpy as np


def main(out_path: str) -> None:
    import lpips as lpips_lib

    model = lpips_lib.LPIPS(net="vgg")
    out = {}
    li = 0
    for layer in model.net.slice1 + model.net.slice2 + model.net.slice3 + \
            model.net.slice4 + model.net.slice5:
        import torch.nn as nn

        if isinstance(layer, nn.Conv2d):
            # torch OIHW -> HWIO
            out[f"conv{li}_w"] = layer.weight.detach().numpy().transpose(2, 3, 1, 0)
            out[f"conv{li}_b"] = layer.bias.detach().numpy()
            li += 1
    for i, lin in enumerate(model.lins):
        w = lin.model[-1].weight.detach().numpy()  # (1, C, 1, 1)
        out[f"lin{i}_w"] = w.reshape(-1)
    np.savez(out_path, **out)
    print(f"wrote {out_path} with {len(out)} arrays")


if __name__ == "__main__":
    main(sys.argv[1])
