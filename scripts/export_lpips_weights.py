"""Export LPIPS-vgg weights to the npz format litegs_tpu reads.

Run on any machine WITH network access and the ``lpips`` package:

    pip install lpips torch torchvision
    python scripts/export_lpips_weights.py ~/.cache/litegs_tpu/lpips_vgg.npz

then copy the file to the air-gapped machine (or set LPIPS_WEIGHTS).
The evaluation harness (litegs_tpu.metrics.lpips_fn) picks it up and
computes LPIPS natively in JAX (litegs_tpu/ops/lpips.py).
"""
import sys

import numpy as np


def main(out_path):
    import lpips
    import torch

    net = lpips.LPIPS(net="vgg")
    vgg = net.net  # lpips.pretrained_networks.vgg16 wrapper
    convs = []
    for slice_name in ("slice1", "slice2", "slice3", "slice4", "slice5"):
        for layer in getattr(vgg, slice_name):
            if isinstance(layer, torch.nn.Conv2d):
                convs.append(layer)
    assert len(convs) == 13, len(convs)
    out = {}
    for i, c in enumerate(convs):
        out[f"conv{i}_weight"] = c.weight.detach().numpy()
        out[f"conv{i}_bias"] = c.bias.detach().numpy()
    for k in range(5):
        lin = getattr(net, f"lin{k}").model[-1]
        out[f"lin{k}"] = lin.weight.detach().numpy().reshape(-1)
    np.savez(out_path, **out)
    print("wrote", out_path)


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "lpips_vgg.npz")
