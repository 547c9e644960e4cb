"""Training losses: fused L1 + DSSIM.

The reference uses the external CUDA ``fused_ssim.fused_l1_ssim_loss``
submodule as its entire training loss (trainer.py:145, weights
(1-lambda)*L1 + lambda*(1-SSIM), lambda = lambda_dssim = 0.2,
arguments.py:89).  On TPU the standard SSIM formulation (11x11 Gaussian
window, sigma 1.5, C1=0.01^2, C2=0.03^2, same-padding) written in jnp is a
chain of depthwise convolutions that XLA fuses and maps to the MXU; no
custom kernel needed.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache()
def _gaussian_window(window_size: int = 11, sigma: float = 1.5):
    xs = np.arange(window_size) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    g = (g / g.sum()).astype(np.float32)
    return g


def _blur(img, window):
    """Separable same-padding Gaussian blur; img [C, H, W].

    Implemented as static shift-adds rather than ``lax.conv``: XLA:TPU
    evaluates f32 convolutions in bf16 by default, and the bf16 error blows
    up catastrophically through SSIM's E[x^2] - mu^2 cancellation (measured
    ssim 0.154 vs the true 0.102 on identical inputs, with per-image values
    beyond 4.0).  Shift-adds are exact f32 and fuse into one VPU pass.
    """
    w = np.asarray(window)
    k = w.shape[0]
    r = k // 2

    def conv_axis(x, axis):
        xp = jnp.pad(x, [(0, 0) if a != axis else (r, r)
                         for a in range(x.ndim)])
        n = x.shape[axis]
        acc = None
        for i in range(k):
            sl = jax.lax.slice_in_dim(xp, i, i + n, axis=axis)
            term = sl * float(w[i])
            acc = term if acc is None else acc + term
        return acc

    return conv_axis(conv_axis(img, 1), 2)


def ssim(img, gt, window_size: int = 11, sigma: float = 1.5,
         c1: float = 0.01 ** 2, c2: float = 0.03 ** 2):
    """Mean SSIM over a [C, H, W] image pair in [0, 1]."""
    win = _gaussian_window(window_size, sigma)
    mu_x = _blur(img, win)
    mu_y = _blur(gt, win)
    mu_xx = mu_x * mu_x
    mu_yy = mu_y * mu_y
    mu_xy = mu_x * mu_y
    sigma_x = _blur(img * img, win) - mu_xx
    sigma_y = _blur(gt * gt, win) - mu_yy
    sigma_xy = _blur(img * gt, win) - mu_xy
    ssim_map = ((2 * mu_xy + c1) * (2 * sigma_xy + c2)
                / ((mu_xx + mu_yy + c1) * (sigma_x + sigma_y + c2)))
    return jnp.mean(ssim_map)


def l1(img, gt):
    return jnp.mean(jnp.abs(img - gt))


def fused_l1_ssim_loss(img, gt, lambda_dssim: float = 0.2):
    """(1 - l) * L1 + l * (1 - SSIM)  (reference trainer.py:145)."""
    return ((1.0 - lambda_dssim) * l1(img, gt)
            + lambda_dssim * (1.0 - ssim(img, gt)))


def psnr(img, gt, data_range: float = 1.0):
    mse = jnp.mean((img - gt) ** 2)
    return 10.0 * jnp.log10(data_range ** 2 / jnp.maximum(mse, 1e-12))
