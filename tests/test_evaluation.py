"""End-to-end eval path: save ply -> load ply -> prepare -> render -> score.

Covers the example_metrics flow (reference example_metrics.py:74-156)
through litegs_tpu.evaluation: the re-rendered views of a saved model
must score near-perfectly against ground-truth renders of the SAME
model, proving the ply round-trip, the Morton re-sort and the eval
renderer agree with the training-side renderer.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from litegs_tpu import config as cfg
from litegs_tpu import evaluation
from litegs_tpu.data import synthetic, synthetic_train
from litegs_tpu.io import ply as ply_io
from litegs_tpu.training.trainer import camera_batch_from_frames


def test_ply_roundtrip_eval_scores_match(tmp_path):
    n, sh_degree = 500, 2
    img_h, img_w = 64, 96
    cam, frames = synthetic.make_cameras(3, img_h, img_w, seed=4)
    gt_params, _, _ = synthetic_train.make_gt_params(n, sh_degree, seed=4)
    pp = cfg.PipelineParams(raster_backend="jnp")

    # ground-truth views rendered straight from the in-memory model
    prepared, active, caps = evaluation.prepare_model(gt_params, pp,
                                                      entry_margin=4.0)
    dummy = np.zeros((3, 3, img_h, img_w), np.float32)
    batch = camera_batch_from_frames(cam, frames, dummy)
    gt_imgs = np.stack([img for _, img in evaluation.render_views(
        prepared, active, batch, pp, caps, sh_degree)])
    assert gt_imgs.max() > 0.05, "scene should be visible"

    # save -> load -> evaluate against those views
    path = str(tmp_path / "point_cloud.ply")
    ply_io.save_ply(path, gt_params)
    loaded = ply_io.load_ply(path)
    batch2 = camera_batch_from_frames(cam, frames, gt_imgs)
    prepared2, active2, caps2 = evaluation.prepare_model(loaded, pp,
                                                         entry_margin=4.0)
    scores = evaluation.score_split(prepared2, active2, batch2, pp, caps2,
                                    sh_degree)
    assert scores["n_views"] == 3
    # f32 ply quantization only: effectively lossless
    assert scores["psnr"] > 45.0, scores
    assert scores["ssim"] > 0.99, scores
