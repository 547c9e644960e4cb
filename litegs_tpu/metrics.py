"""Image quality metrics: PSNR, SSIM, LPIPS (gated).

The reference evaluates with torchmetrics SSIM/PSNR and LPIPS-vgg
(example_metrics.py:93-95).  PSNR/SSIM here are the framework's own jnp
implementations (ops/losses.py, XLA-fused); LPIPS needs pretrained VGG
weights, which this offline environment cannot fetch -- ``lpips_fn``
returns None when unavailable and the eval harness reports 'n/a'.
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .ops import losses


def psnr(img, gt) -> float:
    return float(losses.psnr(jnp.asarray(img), jnp.asarray(gt)))


def ssim(img, gt) -> float:
    return float(losses.ssim(jnp.asarray(img), jnp.asarray(gt)))


def lpips_fn() -> Optional[Callable]:
    """Returns lpips(img, gt) -> float or None if weights are unavailable.

    Tries the ``lpips`` package (torch, VGG backbone) like the reference's
    torchmetrics LPIPS-vgg; both need downloaded weights, so this is
    expected to be None in air-gapped environments.
    """
    try:
        import lpips as lpips_pkg  # noqa: F401
        import torch
    except ImportError:
        return None
    try:
        net = lpips_pkg.LPIPS(net="vgg")
    except Exception:
        return None

    def run(img, gt):
        a = torch.from_numpy(np.asarray(img)[None] * 2.0 - 1.0).float()
        b = torch.from_numpy(np.asarray(gt)[None] * 2.0 - 1.0).float()
        with torch.no_grad():
            return float(net(a, b))

    return run
