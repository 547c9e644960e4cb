"""Closed-loop synthetic training task: render ground-truth images from a
procedurally-generated gaussian scene, then train a fresh model against
them.  Used by tests and bench.py (no datasets ship with the environment).
"""
from __future__ import annotations

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..scene import create_gaussians, pad_params
from ..training.trainer import (CameraBatch, Trainer,
                                camera_batch_from_frames, make_eval_render)
from . import synthetic


def make_gt_params(n_points: int, sh_degree: int, seed: int):
    """A 'ground-truth' scene: the standard init plus randomized opacity,
    anisotropic scales and mild SH variation, so images are non-trivial."""
    xyz, rgb = synthetic.make_gaussian_cloud(n_points, seed=seed)
    params = create_gaussians(xyz, rgb, sh_degree)
    rng = np.random.default_rng(seed + 1)
    op = jnp.asarray(rng.uniform(-1.0, 3.0, (1, n_points)), jnp.float32)
    dscale = jnp.asarray(rng.uniform(-0.5, 0.8, (3, n_points)), jnp.float32)
    rot = jnp.asarray(rng.standard_normal((4, n_points)), jnp.float32)
    return params._replace(opacity=op, scale=params.scale + dscale,
                           rot=rot), xyz, rgb


def make_task(n_points=600, n_frames=8, img_h=64, img_w=96, sh_degree=2,
              seed=0, backend="jnp", interpret=False):
    """Returns (train_data: CameraBatch, init_xyz, init_color, configs)."""
    cam, frames = synthetic.make_cameras(n_frames, img_h, img_w, seed=seed)
    gt_params, xyz, rgb = make_gt_params(n_points, sh_degree, seed)
    caps_gt = cfg.CapacityParams(
        primitive_capacity=cfg.round_up(n_points, 128),
        visible_capacity=cfg.round_up(n_points, 128),
        row_capacity=cfg.round_up(max(n_points * 12, 1 << 14), 128),
        entry_capacity=cfg.round_up(max(n_points * 48, 1 << 15), 128))
    pp = cfg.PipelineParams(raster_backend=backend)
    gt_padded = pad_params(gt_params, caps_gt.primitive_capacity)
    batch = camera_batch_from_frames(
        cam, frames, np.zeros((n_frames, 3, img_h, img_w), np.float32))
    render_fn = make_eval_render(pp, caps_gt, img_h, img_w, sh_degree,
                                 interpret)
    imgs = []
    active = jnp.int32(caps_gt.primitive_capacity)
    for i in range(n_frames):
        img, ov = render_fn(gt_padded, active, batch.view[i], batch.proj[i],
                            batch.planes[i], batch.center[i])
        assert not bool(ov), "GT render overflowed capacities"
        imgs.append(np.asarray(img))
    data = batch._replace(images=jnp.asarray(np.stack(imgs)))
    # jitter the init point cloud so the task is non-trivial
    rng = np.random.default_rng(seed + 7)
    init_xyz = xyz + rng.normal(scale=0.01, size=xyz.shape).astype(
        np.float32)
    return data, init_xyz, rgb
