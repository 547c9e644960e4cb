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

    Prefers the framework's native JAX LPIPS-vgg (ops/lpips.py) fed by a
    local weight file (env LPIPS_WEIGHTS; see scripts/
    export_lpips_weights.py); falls back to the ``lpips`` torch package if
    installed.  Both need pretrained weights, so this returns None in a
    fully air-gapped environment and the eval harness reports 'n/a'.
    """
    from .ops import lpips as jlpips

    weights = None
    try:
        weights = jlpips.load_weights()
    except ValueError:
        weights = None
    if weights is not None:
        return lambda img, gt: jlpips.lpips_distance(img, gt, weights)

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
