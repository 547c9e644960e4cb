"""Shared helpers for building small projected scenes in tests."""
import math

import jax.numpy as jnp
import numpy as np


def random_screen_gaussians(rng, n, img_h, img_w, scale_px=(1.0, 12.0)):
    """Random gaussians directly in screen space.

    Returns (mean_pix [2,N], inv_cov [3,N], color [3,N], opacity [N],
    view_z [N], ndc [4,N]).
    """
    mx = rng.uniform(-8, img_w + 8, n)
    my = rng.uniform(-8, img_h + 8, n)
    # random SPD covariance via rotation + scales
    theta = rng.uniform(0, 2 * np.pi, n)
    s1 = rng.uniform(*scale_px, n)
    s2 = rng.uniform(*scale_px, n)
    ct, st = np.cos(theta), np.sin(theta)
    # cov = R diag(s1^2, s2^2) R^T
    a = ct * ct * s1 * s1 + st * st * s2 * s2
    b = ct * st * (s1 * s1 - s2 * s2)
    c = st * st * s1 * s1 + ct * ct * s2 * s2
    det = a * c - b * b
    inv = np.stack([c / det, -b / det, a / det])
    color = rng.random((3, n))
    opacity = rng.uniform(0.02, 0.99, n)
    view_z = rng.uniform(0.5, 10.0, n)
    ndc_x = (mx + 0.5) / img_w * 2 - 1
    ndc_y = (my + 0.5) / img_h * 2 - 1
    ndc = np.stack([ndc_x, ndc_y, np.full(n, 0.5), np.ones(n)])
    to = lambda x: jnp.asarray(x, jnp.float32)
    return (to(np.stack([mx, my])), to(inv), to(color), to(opacity),
            to(view_z), to(ndc))
