"""Offline evaluation: load a trained ply, re-render, score.

The reference's example_metrics flow (example_metrics.py:74-156): load ply
-> Morton resort -> cluster -> per-frame render -> SSIM/PSNR/LPIPS means
per split.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from . import config as cfg
from . import metrics as metrics_mod
from .scene import pad_params, pad_to_chunk
from .scene.gaussians import GaussianParams
from .training.trainer import CameraBatch, make_eval_render


def prepare_model(params: GaussianParams, pp: cfg.PipelineParams,
                  entry_margin: float = 1.0):
    """Morton-resort + chunk-pad a loaded model; derive render capacities.

    Mirrors example_metrics.py:74-86 (spatial_refine -> cluster_points ->
    get_cluster_AABB; the AABB itself is computed lazily by the renderer).
    """
    from .scene.morton import spatial_sort_indices
    perm = spatial_sort_indices(params.xyz)  # channel-first [3, N]
    params = jax.tree.map(lambda x: jnp.take(x, perm, axis=-1), params)
    params = pad_to_chunk(params, pp.cluster_size)
    n = params.capacity
    caps = cfg.CapacityParams(
        primitive_capacity=n,
        visible_capacity=n,
        row_capacity=cfg.round_up(int(n * 6 * entry_margin), 128),
        entry_capacity=cfg.round_up(int(n * 16 * entry_margin), 128))
    return params, jnp.int32(n), caps


def render_views(params, active_count, batch: CameraBatch,
                 pp: cfg.PipelineParams, caps: cfg.CapacityParams,
                 sh_degree: int, interpret: bool = False):
    """Render every view in the batch; yields (index, img ndarray)."""
    img_h = int(batch.images.shape[2])
    img_w = int(batch.images.shape[3])
    fn = make_eval_render(pp, caps, img_h, img_w, sh_degree, interpret)
    for i in range(batch.images.shape[0]):
        img, overflow = fn(params, active_count, batch.view[i],
                           batch.proj[i], batch.planes[i], batch.center[i])
        if bool(overflow):
            raise RuntimeError(
                f"view {i} overflowed render capacities; raise entry_margin")
        yield i, np.asarray(img)


def score_split(params, active_count, batch: CameraBatch,
                pp: cfg.PipelineParams, caps: cfg.CapacityParams,
                sh_degree: int, dump_dir: Optional[str] = None,
                interpret: bool = False) -> dict:
    """Mean SSIM/PSNR/LPIPS over one split (example_metrics.py:93-156)."""
    lpips = metrics_mod.lpips_fn()
    ssims, psnrs, lpipss = [], [], []
    for i, img in render_views(params, active_count, batch, pp, caps,
                               sh_degree, interpret):
        gt = np.asarray(batch.images[i])
        ssims.append(metrics_mod.ssim(img, gt))
        psnrs.append(metrics_mod.psnr(img, gt))
        if lpips is not None:
            lpipss.append(lpips(img, gt))
        if dump_dir:
            os.makedirs(dump_dir, exist_ok=True)
            import PIL.Image
            arr = (np.clip(img, 0, 1) * 255).astype(np.uint8)
            PIL.Image.fromarray(arr.transpose(1, 2, 0)).save(
                os.path.join(dump_dir, f"{i:05d}.png"))
    return {
        "ssim": float(np.mean(ssims)) if ssims else float("nan"),
        "psnr": float(np.mean(psnrs)) if psnrs else float("nan"),
        "lpips": float(np.mean(lpipss)) if lpipss else None,
        "n_views": len(psnrs),
    }
