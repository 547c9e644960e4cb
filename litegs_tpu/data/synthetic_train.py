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


def make_gt_params(n_points: int, sh_degree: int, seed: int,
                   color_freq: float = 1.0, scale_shift: float = 0.0):
    """A 'ground-truth' scene: the standard init plus randomized opacity,
    anisotropic scales and mild SH variation, so images are non-trivial.

    ``scale_shift`` adds to the log-scales; large clouds pass a negative
    shift (bench.py uses -0.7 for the same reason) so per-point tile
    footprints stay garden-like and the GT render fits its entry table."""
    xyz, rgb = synthetic.make_gaussian_cloud(n_points, seed=seed,
                                             freq=color_freq)
    params = create_gaussians(xyz, rgb, sh_degree)
    rng = np.random.default_rng(seed + 1)
    op = jnp.asarray(rng.uniform(-1.0, 3.0, (1, n_points)), jnp.float32)
    dscale = jnp.asarray(rng.uniform(-0.5, 0.8, (3, n_points)), jnp.float32)
    rot = jnp.asarray(rng.standard_normal((4, n_points)), jnp.float32)
    return params._replace(opacity=op,
                           scale=params.scale + dscale + scale_shift,
                           rot=rot), xyz, rgb


def make_task(n_points=600, n_frames=8, img_h=64, img_w=96, sh_degree=2,
              seed=0, backend="jnp", interpret=False,
              init_points=None, color_freq=1.0):
    """Returns (train_data: CameraBatch, init_xyz, init_color, configs).

    ``init_points`` < n_points subsamples the GT cloud for the model init
    (the SfM-sparse-init regime: the model must densify toward the GT
    density to resolve the texture).  ``color_freq`` > 1 sharpens the GT
    color field so that error signal persists until the splats are fine
    enough -- together these make the densification budget actually spent
    rather than score-limited (reference operating point:
    full_eval_aggressive densify-to-1M, litegs/full_eval_aggressive.py).
    """
    cam, frames = synthetic.make_cameras(n_frames, img_h, img_w, seed=seed)
    gt_params, xyz, rgb = make_gt_params(
        n_points, sh_degree, seed, color_freq=color_freq,
        scale_shift=0.0 if n_points < 200_000 else -0.7)
    # per-point row/entry multipliers shrink with density: 3-NN init scales
    # make splats smaller as the cloud densifies, so large GT clouds need
    # far fewer entries per point (measured ~3-6 at >= 1M points vs ~20-40
    # at <= 10k); the static tables would otherwise dominate device memory
    # ents_pp at >= 200k also keeps entry capacity < 2^24 (the
    # f32-exact start-offset bound in ops/binning.expand_with_table)
    # up to ~1.39M GT points
    rows_pp = 12 if n_points < 200_000 else 6
    ents_pp = 48 if n_points < 200_000 else 12
    caps_gt = cfg.CapacityParams(
        primitive_capacity=cfg.round_up(n_points, 128),
        visible_capacity=cfg.round_up(n_points, 128),
        row_capacity=cfg.round_up(max(n_points * rows_pp, 1 << 14), 128),
        entry_capacity=cfg.round_up(max(n_points * ents_pp, 1 << 15), 128))
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
    if init_points is not None:
        if init_points < xyz.shape[0]:
            keep = rng.choice(xyz.shape[0], size=init_points, replace=False)
            xyz, rgb = xyz[keep], rgb[keep]
        else:
            # a typo'd --init_points >= n_points would silently run the
            # dense-init regime while the user believes they ran sparse
            import warnings
            warnings.warn(
                f"init_points={init_points} >= n_points={xyz.shape[0]}: "
                "no subsampling applied (dense-init regime)")
    init_xyz = xyz + rng.normal(scale=0.01, size=xyz.shape).astype(
        np.float32)
    return data, init_xyz, rgb
