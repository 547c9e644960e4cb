"""Synthetic scene generation for tests and benchmarks.

The environment has no image datasets, so tests and ``bench.py`` build
scenes procedurally: random gaussian clouds plus cameras on a sphere looking
at the origin.  Ground-truth images are produced with the pure-jnp reference
renderer, giving a closed-loop recovery task with the same compute shape as
MipNeRF-360-style training.
"""
from __future__ import annotations

import numpy as np

from .camera import FrameInfo, PinholeCamera
from ..utils import math as um


def make_cameras(n_frames: int, img_h: int, img_w: int,
                 radius: float = 4.0, fov_deg: float = 60.0,
                 seed: int = 0) -> tuple[PinholeCamera, list[FrameInfo]]:
    """Cameras on a sphere of given radius, all looking at the origin."""
    rng = np.random.default_rng(seed)
    focal = (img_w * 0.5) / np.tan(np.radians(fov_deg) / 2)
    cam = PinholeCamera(id=0, width=img_w, height=img_h,
                        focal_x=focal, focal_y=focal)
    frames = []
    for i in range(n_frames):
        # golden-spiral-ish directions with jitter, biased to upper sphere
        theta = 2 * np.pi * (i / n_frames + 0.1 * rng.random())
        phi = np.arccos(np.clip(0.2 + 0.6 * rng.random(), -1, 1))
        center = radius * np.array([np.sin(phi) * np.cos(theta),
                                    np.sin(phi) * np.sin(theta),
                                    np.cos(phi)])
        # build world->cam rotation: camera +z looks at origin
        fwd = -center / np.linalg.norm(center)
        up = np.array([0.0, 0.0, 1.0])
        if abs(np.dot(fwd, up)) > 0.95:
            up = np.array([0.0, 1.0, 0.0])
        right = np.cross(up, fwd)
        right /= np.linalg.norm(right)
        true_up = np.cross(fwd, right)
        R = np.stack([right, true_up, fwd])          # world->cam rows
        t = -R @ center
        qvec = um.rotmat2qvec(R)
        frames.append(FrameInfo(id=i, qvec=qvec, tvec=t, camera_id=0,
                                name=f"synth_{i:04d}"))
    return cam, frames


def make_gaussian_cloud(n_points: int, seed: int = 0, extent: float = 1.5,
                        freq: float = 1.0):
    """Random seed point cloud: positions in a ball, colors from a smooth
    spatial field.

    Colors follow low-frequency functions of position (plus small noise)
    rather than iid noise: iid colors make the rendered images white-noise-
    like, where the L1+SSIM objective and PSNR decouple and convergence
    can't be judged; a smooth field matches the statistics of real scenes.

    ``freq`` scales the spatial frequency of the color field.  freq > 1
    adds detail a sparse model cannot represent, giving the densification
    controller persistent image-error signal to spend its budget on (the
    natural-image analogue: texture finer than the current splat size).
    """
    rng = np.random.default_rng(seed)
    xyz = rng.normal(size=(n_points, 3)).astype(np.float32)
    xyz *= extent / np.maximum(np.linalg.norm(xyz, axis=1, keepdims=True), 1)
    r = rng.random((n_points, 1)).astype(np.float32) ** (1 / 3)
    xyz = xyz * r
    x, y, z = xyz[:, 0], xyz[:, 1], xyz[:, 2]
    f = freq
    base = np.stack([
        0.5 + 0.38 * np.sin(2.1 * f * x + 0.3) * np.cos(1.7 * f * z),
        0.5 + 0.38 * np.sin(1.3 * f * y + 1.1) * np.cos(2.3 * f * x),
        0.5 + 0.38 * np.sin(1.9 * f * z + 2.0) * np.cos(1.1 * f * y)],
        axis=1)
    if freq > 1.0:
        # second octave: keeps high-freq structure from averaging to gray
        base += np.stack([
            0.18 * np.sin(4.7 * f * x + 1.9 * f * y),
            0.18 * np.cos(5.3 * f * y + 2.3 * f * z),
            0.18 * np.sin(4.1 * f * z + 2.9 * f * x)], axis=1)
    noise = rng.normal(scale=0.05, size=(n_points, 3))
    color = np.clip(base + noise, 0.0, 1.0).astype(np.float32)
    return xyz, color
