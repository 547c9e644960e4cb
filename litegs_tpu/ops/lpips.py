"""LPIPS perceptual distance (VGG16 backbone) in pure JAX.

The reference evaluates LPIPS-vgg via torchmetrics (example_metrics.py:95),
which downloads pretrained weights at first use.  This environment is
air-gapped, so the network is implemented natively and the weights load
from a local ``.npz`` (env ``LPIPS_WEIGHTS`` or ``~/.cache/litegs_tpu/
lpips_vgg.npz``); without the file the metric reports unavailable.

The computation follows the standard LPIPS formulation (Zhang et al.,
CVPR'18, as implemented by the ``lpips`` package): input scaling layer,
VGG16 conv features tapped at relu{1_2, 2_2, 3_3, 4_3, 5_3},
channel-unit-normalization, squared difference, learned 1x1 linear
weights, spatial mean, sum over taps.

Export the weight file on any machine with torch + lpips installed:

    import lpips, numpy as np
    net = lpips.LPIPS(net='vgg')
    w = {}
    for i, layer in enumerate(net.net.slice1):  # torchvision vgg16
        pass  # see scripts/export_lpips_weights.py for the full exporter
"""
from __future__ import annotations

import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

# VGG16 feature config up to conv5_3: channel widths per conv layer, with
# 'M' = 2x2 max pool.  LPIPS taps after the relu preceding each pool (and
# the final relu).
_VGG_CFG = (64, 64, "M", 128, 128, "M", 256, 256, 256, "M",
            512, 512, 512, "M", 512, 512, 512)
# indices (within conv layers only) after which features are tapped
_TAPS = (1, 3, 6, 9, 12)
# lpips ScalingLayer constants
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def default_weight_path() -> str:
    return os.environ.get(
        "LPIPS_WEIGHTS",
        os.path.expanduser("~/.cache/litegs_tpu/lpips_vgg.npz"))


def load_weights(path: Optional[str] = None):
    """Load {convN_weight, convN_bias, linN} arrays or None if absent.

    Expected npz keys: ``conv{i}_weight`` [out, in, 3, 3] (torch layout),
    ``conv{i}_bias`` [out] for i in 0..12, and ``lin{k}`` [C_k] for
    k in 0..4 (the lpips 1x1 calibration weights, squeezed).
    """
    path = path or default_weight_path()
    if not os.path.exists(path):
        return None
    data = np.load(path)
    n_convs = len([c for c in _VGG_CFG if c != "M"])
    try:
        convs = [(jnp.asarray(data[f"conv{i}_weight"], jnp.float32),
                  jnp.asarray(data[f"conv{i}_bias"], jnp.float32))
                 for i in range(n_convs)]
        lins = [jnp.asarray(data[f"lin{k}"], jnp.float32)
                for k in range(len(_TAPS))]
    except KeyError as e:
        raise ValueError(f"LPIPS weight file {path} missing key: {e}")
    return {"convs": convs, "lins": lins}


def _conv3x3(x, w, b):
    """x [C,H,W], torch-layout w [O,I,3,3] -> [O,H,W] (same padding)."""
    out = jax.lax.conv_general_dilated(
        x[None], w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        precision=jax.lax.Precision.HIGHEST)[0]
    return out + b[:, None, None]


def _vgg_features(x, convs):
    """x [3,H,W] in [0,1] -> list of tapped feature maps."""
    # canonical lpips-package input path (v0.1, normalize=True): map
    # [0,1] -> [-1,1] first, THEN the ScalingLayer (shift/scale are
    # defined on the [-1,1] domain) -- cross-checked against a torch
    # transcription in tests/test_lpips_torch_parity.py
    x = (2.0 * x - 1.0 - _SHIFT[:, None, None]) / _SCALE[:, None, None]
    feats = []
    ci = 0
    for c in _VGG_CFG:
        if c == "M":
            x = -jax.lax.reduce_window(
                -x, jnp.inf, jax.lax.min, (1, 2, 2), (1, 2, 2), "VALID")
        else:
            w, b = convs[ci]
            x = jax.nn.relu(_conv3x3(x, w, b))
            if ci in _TAPS:
                feats.append(x)
            ci += 1
    return feats


@functools.partial(jax.jit, static_argnames=())
def _lpips_pair(img, gt, *flat):
    # reconstruct weights from flat args (jit-friendly)
    n_convs = len([c for c in _VGG_CFG if c != "M"])
    convs = [(flat[2 * i], flat[2 * i + 1]) for i in range(n_convs)]
    lins = list(flat[2 * n_convs:])
    fa = _vgg_features(img, convs)
    fb = _vgg_features(gt, convs)
    total = 0.0
    for a, b, lin in zip(fa, fb, lins):
        # lpips.normalize_tensor adds eps OUTSIDE the sqrt
        na = a / (jnp.sqrt(jnp.sum(a * a, axis=0, keepdims=True)) + 1e-10)
        nb = b / (jnp.sqrt(jnp.sum(b * b, axis=0, keepdims=True)) + 1e-10)
        d = (na - nb) ** 2                        # [C, H, W]
        total = total + jnp.mean(
            jnp.sum(lin[:, None, None] * d, axis=0))
    return total


def lpips_distance(img, gt, weights) -> float:
    """LPIPS between two [3,H,W] images in [0,1]."""
    flat = []
    for w, b in weights["convs"]:
        flat += [w, b]
    flat += weights["lins"]
    return float(_lpips_pair(jnp.asarray(img, jnp.float32),
                             jnp.asarray(gt, jnp.float32), *flat))
