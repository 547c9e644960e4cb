"""Pose optimization (learnable_viewproj): camera extrinsics with injected
noise must move back toward the truth when trained against ground-truth
images rendered from the true cameras.

Note the reference only half-wires this feature (its MVPTransform backward
returns position gradients only, wrapper.py:278-285, so extr can never
receive a gradient there); this path is fully functional here.
"""
import jax
import jax.numpy as jnp
import numpy as np

from litegs_tpu import config as cfg
from litegs_tpu.data import synthetic, synthetic_train
from litegs_tpu.ops import pose as pose_ops
from litegs_tpu.scene import pad_params, pad_to_chunk
from litegs_tpu.training import statistics
from litegs_tpu.training.optimizer import init_adam
from litegs_tpu.training.trainer import (TrainState, Trainer,
                                         camera_batch_from_frames)
from litegs_tpu.utils import math as um


def test_camera_from_extr_matches_host_math():
    cam, frames = synthetic.make_cameras(3, 48, 64, seed=1)
    proj = jnp.asarray(cam.proj_matrix())
    for fr in frames:
        view, planes, center = pose_ops.camera_from_extr(
            jnp.asarray(fr.extr_params()), proj)
        np.testing.assert_allclose(np.asarray(view), fr.view_matrix(),
                                   rtol=1e-5, atol=1e-6)
        np.testing.assert_allclose(np.asarray(center), fr.camera_center(),
                                   rtol=1e-4, atol=1e-6)
        np.testing.assert_allclose(np.asarray(planes),
                                   fr.frustumplane(np.asarray(proj)),
                                   rtol=1e-4, atol=1e-5)


def test_pose_refinement_reduces_extr_error():
    n_points, n_frames, img_h, img_w = 500, 6, 48, 64
    # ground-truth scene + images from TRUE cameras
    cam, frames = synthetic.make_cameras(n_frames, img_h, img_w, seed=3)
    data, _, _ = synthetic_train.make_task(
        n_points=n_points, n_frames=n_frames, img_h=img_h, img_w=img_w,
        sh_degree=1, seed=3)
    gt_params, _, _ = synthetic_train.make_gt_params(n_points, 1, seed=3)

    true_extr = np.stack([fr.extr_params() for fr in frames])
    rng = np.random.default_rng(0)
    noise = np.zeros_like(true_extr)
    noise[:, 4:] = rng.normal(scale=0.01, size=(n_frames, 3))
    noise[:, :4] = rng.normal(scale=0.004, size=(n_frames, 4))
    noisy_extr = (true_extr + noise).astype(np.float32)

    # gaussians fixed at ground truth (zero lrs) => only pose trains
    lp = cfg.ModelParams(sh_degree=1)
    tiny = 1e-12  # effectively frozen (xyz lr schedule needs log(lr))
    op = cfg.OptimizationParams(iterations=20 * n_frames,
                                position_lr_init=tiny,
                                position_lr_final=tiny, feature_lr=0.0,
                                opacity_lr=0.0, scaling_lr=0.0,
                                rotation_lr=0.0, learnable_viewproj=True)
    pp = cfg.PipelineParams(raster_backend="jnp", adaptive_capacity=False)
    dp = cfg.DensifyParams(densify_from=10**9)
    caps = cfg.CapacityParams(primitive_capacity=cfg.round_up(n_points, 128),
                              visible_capacity=cfg.round_up(n_points, 128),
                              row_capacity=8192, entry_capacity=32768)
    trainer = Trainer(lp=lp, op=op, pp=pp, dp=dp, caps=caps, data=data,
                      spatial_lr_scale=1.0, extr_init=noisy_extr)
    trainer.init_points_num = caps.primitive_capacity

    params = pad_params(pad_to_chunk(gt_params, 128),
                        caps.primitive_capacity)
    state = TrainState(params=params, adam=init_adam(params),
                       active_count=jnp.int32(caps.primitive_capacity),
                       step=jnp.int32(0))
    stats = statistics.init_stats(caps.primitive_capacity)

    psnr0 = None
    for epoch in range(20):
        state, stats, m = trainer.run_epoch(state, stats, epoch)
        if psnr0 is None:
            psnr0 = m["psnr"]
    learned = np.asarray(trainer.pose_state.extr)

    # normalize quats for a fair comparison (scale is gauge freedom)
    def norm_q(e):
        out = e.copy()
        out[:, :4] /= np.linalg.norm(out[:, :4], axis=1, keepdims=True)
        return out

    err1 = np.linalg.norm(norm_q(learned) - norm_q(true_extr))
    err0n = np.linalg.norm(norm_q(noisy_extr) - norm_q(true_extr))
    # gaussians are frozen at ground truth, so any PSNR gain is pose
    # recovery; the raw extr L2 also drops, but weakly-observable
    # coordinates (depth/roll at 48x64 px) retain noise -- expected for
    # photometric pose refinement, hence the soft threshold
    assert err1 < 0.93 * err0n, (err0n, err1)
    assert m["psnr"] > psnr0 + 1.0, (psnr0, m["psnr"])
