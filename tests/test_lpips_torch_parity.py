"""Cross-validate the native JAX LPIPS against a torch transcription.

The reference evaluates LPIPS-vgg through torchmetrics
(example_metrics.py:95), whose computation is the canonical Zhang et
al. CVPR'18 pipeline (the ``lpips`` package, v0.1 with normalize=True):

    x <- 2x - 1                       # [0,1] -> [-1,1]
    x <- (x - shift) / scale          # ScalingLayer
    taps = vgg16 relu{1_2,2_2,3_3,4_3,5_3}(x)
    d = sum_k mean_hw( lin_k . (unit_norm(a_k) - unit_norm(b_k))^2 )

No pretrained weights exist in this air-gapped environment, but the
NETWORK COMPUTATION is weight-independent: this test instantiates random
VGG + lin weights and asserts the JAX implementation matches a direct
torch transcription of the lpips-package forward pass to float32
tolerance.  This pins the scaling layer, conv/pool stack, tap indices,
channel unit-normalization, and the linear calibration head.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn.functional as F  # noqa: E402

from litegs_tpu.ops import lpips as jlpips  # noqa: E402

_WIDTHS = [64, 64, 128, 128, 256, 256, 256, 512, 512, 512, 512, 512, 512]
_POOL_BEFORE = {2, 4, 7, 10}  # MaxPool2d precedes these conv indices
_TAPS = (1, 3, 6, 9, 12)
_SHIFT = torch.tensor([-0.030, -0.088, -0.188]).view(1, 3, 1, 1)
_SCALE = torch.tensor([0.458, 0.448, 0.450]).view(1, 3, 1, 1)


def _rand_weights(rng):
    convs, cin = [], 3
    for cout in _WIDTHS:
        w = rng.standard_normal((cout, cin, 3, 3)).astype(np.float32)
        w *= (2.0 / (cin * 9)) ** 0.5
        b = 0.1 * rng.standard_normal(cout).astype(np.float32)
        convs.append((w, b))
        cin = cout
    lins = [np.abs(rng.standard_normal(_WIDTHS[t]).astype(np.float32))
            for t in _TAPS]
    return convs, lins


def _torch_vgg_feats(x, convs):
    """x [1,3,H,W] in [0,1] -> tapped features, lpips-package semantics."""
    x = 2.0 * x - 1.0                       # normalize=True
    x = (x - _SHIFT) / _SCALE               # ScalingLayer
    feats = []
    for i, (w, b) in enumerate(convs):
        if i in _POOL_BEFORE:
            x = F.max_pool2d(x, 2, 2)
        x = F.relu(F.conv2d(x, torch.from_numpy(w), torch.from_numpy(b),
                            padding=1))
        if i in _TAPS:
            feats.append(x)
    return feats


def _torch_lpips(img, gt, convs, lins):
    a = _torch_vgg_feats(torch.from_numpy(img[None]), convs)
    b = _torch_vgg_feats(torch.from_numpy(gt[None]), convs)
    total = 0.0
    for fa, fb, lin in zip(a, b, lins):
        # lpips.normalize_tensor: x / (sqrt(sum x^2) + 1e-10)
        na = fa / (fa.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        nb = fb / (fb.pow(2).sum(dim=1, keepdim=True).sqrt() + 1e-10)
        d = (na - nb).pow(2)
        lw = torch.from_numpy(lin).view(1, -1, 1, 1)
        total = total + (lw * d).sum(dim=1).mean()
    return float(total)


def test_lpips_matches_torch_transcription():
    rng = np.random.default_rng(7)
    convs, lins = _rand_weights(rng)
    weights = {"convs": [(np.asarray(w), np.asarray(b)) for w, b in convs],
               "lins": [np.asarray(l) for l in lins]}
    img = rng.random((3, 33, 47)).astype(np.float32)  # odd dims on purpose
    gt = np.clip(img + 0.1 * rng.standard_normal(img.shape), 0, 1
                 ).astype(np.float32)

    ours = jlpips.lpips_distance(img, gt, weights)
    ref = _torch_lpips(img, gt, convs, lins)
    assert ref > 0
    assert ours == pytest.approx(ref, rel=2e-4), (ours, ref)
