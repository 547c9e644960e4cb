"""Multi-chip scale-out: device mesh + data-parallel train step.

The reference is strictly single-GPU (SURVEY.md §2.5: no NCCL/MPI/
torch.distributed anywhere); its per-op batch dimension ``B`` (always 1 in
the trainer, litegs/training/trainer.py:51) is the natural seam for TPU
scale-out.  Here that seam becomes a named mesh axis:

* **cameras are sharded** over the ``data`` axis — each chip renders its own
  view(s) per step (the reference's ``B`` dimension, e.g. raster.cu:182);
* **gaussian parameters are replicated** — every chip holds the full model;
* **gradients are combined with ``psum`` over ICI** inside the jitted step,
  so XLA overlaps the all-reduce with the tail of the backward pass;
* the sparse-Adam visibility mask is the **union** (``pmax``) of each chip's
  visible chunks, preserving the reference semantics "update what was
  rendered this step" (litegs/training/optimizer.py:9-44);
* densification statistics are local scatter-adds ``psum``-merged into the
  replicated accumulator (statistic_helper.py:97-156 equivalent).

Semantics note: one parallel step applies ONE optimizer update from the
mean gradient of D views, where the reference applies D sequential updates.
This is standard large-batch data parallelism; lr scaling is left to the
caller.  All collectives ride ICI; nothing here touches DCN.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from .. import config as cfg
from ..ops import losses
from ..ops import raster as raster_ops
from ..render import render, render_preprocess
from ..scene import cluster
from ..training import statistics
from ..training.optimizer import LearningRates, sparse_adam_step
from ..training.trainer import TrainState
from ..utils import math as um

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> int:
    """Multi-host bring-up: ``jax.distributed.initialize`` with the standard
    TPU-pod auto-detection (no-op on a single host).

    After this, ``jax.devices()`` spans the whole slice and ``make_mesh()``
    builds a global camera-data mesh: gradient psum rides ICI within a host
    and DCN only for the cross-host hops of the all-reduce; the epoch-
    boundary densification runs on replicated state so no resharding or
    extra DCN traffic is needed.  Returns the global device count.
    """
    explicit = (coordinator_address is not None
                or num_processes is not None or process_id is not None)
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=num_processes,
                                   process_id=process_id)
    except RuntimeError as e:
        if "already initialized" in str(e).lower():
            pass
        elif explicit:
            raise  # a requested multi-host bring-up must not silently
            #        degrade to single-host
    except ValueError:
        if explicit:
            raise
        # else: no cluster environment to auto-detect -- single process
    return len(jax.devices())


def make_mesh(n_devices: Optional[int] = None,
              axis_name: str = DATA_AXIS) -> Mesh:
    """1-D device mesh over the first ``n_devices`` (global) devices."""
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    import numpy as np
    return Mesh(np.asarray(devs[:n_devices]), (axis_name,))


def shard_camera_batch(mesh: Mesh, *arrays):
    """Place camera tensors with their leading (frame) axis sharded."""
    out = []
    for a in arrays:
        spec = P(DATA_AXIS, *([None] * (a.ndim - 1)))
        out.append(jax.device_put(a, NamedSharding(mesh, spec)))
    return tuple(out)


def unit_weights(mesh: Mesh):
    """All-ones per-chip gradient weights (no padding slots), sharded."""
    d = int(mesh.devices.size)
    (w,) = shard_camera_batch(mesh, jnp.ones((d,), jnp.float32))
    return w


def replicate(mesh: Mesh, tree):
    """Fully replicate a pytree across the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.tree.map(lambda x: jax.device_put(x, sharding), tree)


def make_parallel_train_step(lp: cfg.ModelParams, op: cfg.OptimizationParams,
                             pp: cfg.PipelineParams, caps: cfg.CapacityParams,
                             img_h: int, img_w: int, spatial_lr_scale: float,
                             sh_degree: int, collect_stats: bool,
                             mesh: Mesh, interpret: bool = False,
                             sharded_stats: bool = False,
                             lr_scale: float = 1.0):
    """Build the jitted multi-chip train step.

    The returned function takes ``(state, stats, chunk_origin, chunk_extend,
    view[D,4,4], proj[D,4,4], planes[D,6,4], center[D,3], gt[D,3,H,W],
    weight[D])`` where D = mesh size, with camera tensors sharded over
    ``data`` and everything else replicated; it returns (state, stats,
    metrics) with the same replicated placement.

    ``weight``: per-chip gradient weights (normally all 1).  A 0 marks a
    PADDING slot -- when the frame count is not a multiple of D the last
    step group pads with duplicate frames, and their gradients, stats,
    chunk-visibility, overflow votes and metrics must not count (the
    weighted psum-mean with w=0 reproduces the exact F-frame epoch
    semantics of the reference's one-view-per-step loop).

    ``sharded_stats``: keep the densification statistics accumulators
    sharded over the primitive axis (P('data')) and merge each step's
    delta with ``psum_scatter`` instead of a replicated ``psum`` -- D x
    less stats memory and all-reduce traffic; feeds the sharded
    densification pass (parallel.densify).
    """
    import math as pymath
    tile_h, tile_w = pp.tile_size
    tiles_x = pymath.ceil(img_w / tile_w)
    tiles_total = pymath.ceil(img_h / tile_h) * tiles_x
    chunk_size = pp.cluster_size
    nchunks = caps.primitive_capacity // chunk_size

    # statistics ride the shared VJP via the gradient sink on the Pallas
    # backend (see training/trainer.make_train_step and ops/raster)
    use_sink = collect_stats and pp.raster_backend == "pallas"

    def shard_fn(state: TrainState, stats, chunk_origin, chunk_extend,
                 view, proj, planes, center, gt_image, weight):
        # local leading axis is 1 (one camera per chip)
        view, proj = view[0], proj[0]
        planes, center, gt_image = planes[0], center[0], gt_image[0]
        w = weight[0]                      # 0.0 marks a padding slot
        live = w > 0.0

        def loss_fn(params, sink=None):
            culled = render_preprocess(params, chunk_origin, chunk_extend,
                                       planes, center, sh_degree, pp, caps)
            out = render(culled, view, proj, img_h, img_w, pp, caps,
                         interpret=interpret, stats_sink=sink)
            loss = losses.fused_l1_ssim_loss(out.img, gt_image,
                                             op.lambda_dssim)
            if op.reg_weight > 0.0:
                loss = loss + jnp.mean(culled.scale ** 2) * op.reg_weight
            if pp.enable_transmitance:
                loss = loss + jnp.mean(jnp.abs(1.0 - out.transmitance))
            return loss, (out, culled)

        g_sink = None
        if use_sink:
            sink0 = raster_ops.zero_stats_sink(caps.visible_capacity)
            (loss, (out, culled)), (grads, g_sink) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(state.params, sink0)
        else:
            (loss, (out, culled)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)

        # gradient all-reduce over ICI (replicated-param data parallelism):
        # weighted mean so padding slots contribute exactly nothing.
        # The reduce rides in bf16 by default (pp.grad_allreduce_dtype):
        # halves the per-step collective volume (~236 MB of f32 grads at
        # 1M primitives, SCALING_r4.md), and the ~2^-8 relative rounding
        # lands in Adam's scale-invariant m/sqrt(v) -- convergence parity
        # at equal updates is pinned by
        # tests/test_parallel_trainer.py::test_parallel_equals_sequential
        # _at_equal_updates (which runs in bf16 mode).
        wsum = jax.lax.psum(w, DATA_AXIS)  # >= 1 (a group has >= 1 live)
        if pp.grad_allreduce_dtype == "bf16":
            grads = jax.tree.map(
                lambda g: jax.lax.psum(
                    (g * w).astype(jnp.bfloat16), DATA_AXIS
                ).astype(jnp.float32) / wsum, grads)
        else:
            grads = jax.tree.map(
                lambda g: jax.lax.psum(g * w, DATA_AXIS) / wsum, grads)
        loss = jax.lax.psum(loss * w, DATA_AXIS) / wsum

        chunk_mask = cluster.scatter_chunk_mask(
            culled.chunk_ids, culled.num_visible_chunks, nchunks)
        chunk_mask = jax.lax.pmax(
            (chunk_mask & live).astype(jnp.int32), DATA_AXIS) > 0

        lrs = LearningRates.from_config(op, spatial_lr_scale, state.step)
        if lr_scale != 1.0:
            # large-batch compensation: one mean-gradient update replaces D
            # sequential updates; sqrt(D) is the Adam-appropriate default
            # (Adam's m/sqrt(v) is invariant to gradient *scaling*, so only
            # the lr can restore the lost D-step progress)
            lrs = LearningRates(*[l * lr_scale for l in lrs])
        new_params, new_adam = sparse_adam_step(
            state.params, grads, state.adam, lrs, chunk_mask, chunk_size)

        # overflow-safe stepping (any LIVE chip truncating => global no-op;
        # see trainer.make_train_step) -- the mean gradient already mixes
        # every live chip's contribution, so one truncated view poisons all
        # of it.  A padding slot's overflow is moot: its weight is 0, so
        # its (truncated) gradient never enters the mean.
        overflow = jax.lax.pmax((out.overflow & live).astype(jnp.int32),
                                DATA_AXIS) > 0

        def keep_old(new, old):
            return jax.tree.map(
                lambda a, b: jnp.where(overflow, b, a), new, old)

        new_params = keep_old(new_params, state.params)
        new_adam = keep_old(new_adam, state.adam)
        new_state = TrainState(
            params=new_params, adam=new_adam,
            active_count=state.active_count,
            step=state.step + jnp.where(overflow, 0, 1))

        if collect_stats:
            if use_sink:
                rstats = g_sink  # RasterStats off the shared VJP
            else:
                aux = out.aux

                def tile_loss(tiles_color, tiles_trans):
                    img_all = um.tiles_to_img(tiles_color, img_h, img_w,
                                              tile_h, tile_w)
                    img = jnp.clip(img_all[:3], 0.0, 1.0)
                    ls = losses.fused_l1_ssim_loss(img, gt_image,
                                                   op.lambda_dssim)
                    if pp.enable_transmitance:
                        t_img = um.tiles_to_img(tiles_trans[:, None], img_h,
                                                img_w, tile_h, tile_w)
                        ls = ls + jnp.mean(jnp.abs(1.0 - t_img))
                    return ls

                d_col, d_trans = jax.grad(tile_loss, argnums=(0, 1))(
                    aux.tiles_color, aux.tiles_trans)
                rstats = raster_ops.raster_stats(
                    aux.mean_pix, aux.inv_cov, aux.color_chan, aux.opacity,
                    aux.table, aux.tiles_color, aux.tiles_trans, d_col,
                    d_trans, tiles_total, tiles_x, tile_h, tile_w, img_h,
                    img_w, backend=pp.raster_backend, interpret=interpret,
                    cache=aux.cache)
            zero = statistics.init_stats(caps.primitive_capacity)
            delta = statistics.update_stats(
                zero, culled.chunk_ids, culled.valid,
                out.primitive_visible, rstats, chunk_size)
            # padding slots must not pollute the accumulators
            delta = jax.tree.map(lambda x: x * w.astype(x.dtype), delta)
            if sharded_stats:
                from . import densify as pdensify
                new_stats = pdensify.scatter_stats_update(stats, delta)
            else:
                delta = jax.lax.psum(delta, DATA_AXIS)
                new_stats = jax.tree.map(jnp.add, stats, delta)
            stats = keep_old(new_stats, stats)

        psnr = jax.lax.psum(losses.psnr(out.img, gt_image) * w,
                            DATA_AXIS) / wsum
        # per-chip sizes allgathered (not pmax'd): the trainer's per-frame
        # capacity feedback needs each frame's own observation
        metrics = {"loss": loss, "psnr": psnr, "overflow": overflow,
                   "sizes": jax.lax.all_gather(out.sizes, DATA_AXIS),
                   "chip_overflow": jax.lax.all_gather(
                       out.overflow & live, DATA_AXIS)}
        return new_state, stats, metrics

    rep = P()
    cam = P(DATA_AXIS)
    stats_spec = (statistics.StatsState(*([P(DATA_AXIS)] * 7))
                  if sharded_stats else rep)
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep, stats_spec, rep, rep, cam, cam, cam, cam, cam, cam),
        out_specs=(rep, stats_spec, rep),
        check_vma=False)
    return jax.jit(mapped, donate_argnums=(0, 1))
