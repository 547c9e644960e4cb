"""Multi-chip data parallelism on a virtual 8-device CPU mesh.

Validates that the sharded train step (cameras over the ``data`` axis,
replicated params, psum'd grads) compiles, runs, and agrees with an
equivalent single-device computation.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litegs_tpu import config as cfg
from litegs_tpu import parallel
from litegs_tpu.data import synthetic
from litegs_tpu.scene import create_gaussians, pad_params
from litegs_tpu.training import statistics
from litegs_tpu.training.optimizer import init_adam
from litegs_tpu.training.trainer import (TrainState, camera_batch_from_frames,
                                         masked_chunk_aabb)


def _setup(n_dev, img_h=32, img_w=32, n_points=300, sh_degree=1,
           grad_dtype="bf16"):
    cam, frames = synthetic.make_cameras(n_dev, img_h, img_w, seed=0)
    xyz, rgb = synthetic.make_gaussian_cloud(n_points, seed=0)
    params = pad_params(create_gaussians(xyz, rgb, sh_degree),
                        cfg.round_up(n_points, 128))
    caps = cfg.CapacityParams(
        primitive_capacity=params.capacity,
        visible_capacity=params.capacity,
        row_capacity=cfg.round_up(n_points * 8, 128),
        entry_capacity=cfg.round_up(n_points * 32, 128))
    pp = cfg.PipelineParams(raster_backend="jnp",
                            grad_allreduce_dtype=grad_dtype)
    imgs = np.random.default_rng(0).random(
        (n_dev, 3, img_h, img_w)).astype(np.float32)
    batch = camera_batch_from_frames(cam, frames, imgs)
    state = TrainState(params=params, adam=init_adam(params),
                       active_count=jnp.int32(n_points), step=jnp.int32(0))
    stats = statistics.init_stats(caps.primitive_capacity)
    return batch, state, stats, caps, pp, sh_degree, img_h, img_w


def _run_parallel(n_dev, collect, grad_dtype="bf16"):
    mesh = parallel.make_mesh(n_dev)
    (batch, state, stats, caps, pp, sh_degree, img_h, img_w) = _setup(
        n_dev, grad_dtype=grad_dtype)
    lp, op_ = cfg.ModelParams(sh_degree=sh_degree), cfg.OptimizationParams()
    origin, extend = masked_chunk_aabb(state.params, state.active_count,
                                       pp.cluster_size)
    state = parallel.replicate(mesh, state)
    stats = parallel.replicate(mesh, stats)
    origin, extend = parallel.replicate(mesh, (origin, extend))
    view, proj, planes, center, gt = parallel.shard_camera_batch(
        mesh, batch.view, batch.proj, batch.planes, batch.center,
        batch.images)
    step_fn = parallel.make_parallel_train_step(
        lp, op_, pp, caps, img_h, img_w, spatial_lr_scale=1.0,
        sh_degree=sh_degree, collect_stats=collect, mesh=mesh)
    return step_fn(state, stats, origin, extend, view, proj, planes,
                   center, gt, parallel.unit_weights(mesh))


def test_parallel_step_runs_8dev():
    assert len(jax.devices()) >= 8
    state, stats, metrics = _run_parallel(8, collect=True)
    assert np.isfinite(float(metrics["loss"]))
    assert not bool(metrics["overflow"])
    # stats accumulated from all 8 views
    assert float(jnp.sum(stats.frag_count)) > 0
    assert int(state.step) == 1


def test_parallel_matches_single_device_mean_grad():
    """The D-way parallel step must equal a single-device step taking the
    mean gradient over the same D views with the union visibility mask."""
    n_dev = 4
    # exact-equality check => f32 gradient psum (the default bf16 wire
    # dtype trades exactness for halved ICI volume; its convergence
    # parity is pinned by test_parallel_trainer's equal-updates test)
    state_p, _, metrics_p = _run_parallel(n_dev, collect=False,
                                          grad_dtype="f32")

    # single-device replica: mean grads over views, union chunk mask
    from litegs_tpu.ops import losses
    from litegs_tpu.render import render, render_preprocess
    from litegs_tpu.scene import cluster
    from litegs_tpu.training.optimizer import (LearningRates,
                                               sparse_adam_step)
    (batch, state, stats, caps, pp, sh_degree, img_h, img_w) = _setup(n_dev)
    op_ = cfg.OptimizationParams()
    origin, extend = masked_chunk_aabb(state.params, state.active_count,
                                       pp.cluster_size)

    def one_view(params, i):
        culled = render_preprocess(params, origin, extend, batch.planes[i],
                                   batch.center[i], sh_degree, pp, caps)
        out = render(culled, batch.view[i], batch.proj[i], img_h, img_w,
                     pp, caps)
        return losses.fused_l1_ssim_loss(out.img, batch.images[i],
                                         op_.lambda_dssim), culled

    grads_acc = None
    nchunks = caps.primitive_capacity // pp.cluster_size
    mask_acc = jnp.zeros((nchunks,), bool)
    loss_acc = 0.0
    for i in range(n_dev):
        (loss, culled), g = jax.value_and_grad(
            lambda p: one_view(p, i), has_aux=True)(state.params)
        grads_acc = g if grads_acc is None else jax.tree.map(
            jnp.add, grads_acc, g)
        mask_acc = mask_acc | cluster.scatter_chunk_mask(
            culled.chunk_ids, culled.num_visible_chunks, nchunks)
        loss_acc += float(loss)
    grads = jax.tree.map(lambda x: x / n_dev, grads_acc)
    lrs = LearningRates.from_config(op_, 1.0, state.step)
    _, ref_adam = sparse_adam_step(state.params, grads, state.adam, lrs,
                                   mask_acc, pp.cluster_size)

    assert np.isclose(float(metrics_p["loss"]), loss_acc / n_dev,
                      rtol=1e-5, atol=1e-6)
    # Compare first moments (linear in the gradient): Adam's m/(sqrt(v)+eps)
    # would amplify reduction-order float noise into sign flips wherever the
    # mean gradient is ~0, so params themselves are not a stable target.
    for a, b in zip(state_p.adam.exp_avg, ref_adam.exp_avg):
        a, b = np.asarray(a), np.asarray(b)
        # floor: isotropic-scale identity-quat init makes rot grads pure
        # float noise (~1e-12); don't compare noise against noise
        tol = max(1e-5 * np.abs(b).max(), 1e-9)
        np.testing.assert_allclose(a, b, rtol=1e-4, atol=tol)


def test_graft_entry_dryrun():
    import sys
    sys.path.insert(0, "/root/repo")
    import __graft_entry__ as ge
    fn, args = ge.entry()
    img = jax.jit(fn)(*args)
    assert img.shape[0] == 3 and np.all(np.isfinite(np.asarray(img)))
    ge.dryrun_multichip(8)
