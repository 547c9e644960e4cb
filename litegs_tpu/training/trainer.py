"""Training orchestration: the jitted train step and the epoch loop.

Functional redesign of the reference trainer (litegs/training/trainer.py:
26-227).  One `train_step` covers render_preprocess -> render -> fused
L1+SSIM loss -> backward -> sparse Adam, compiled once per
(sh_degree, collect_stats) combination; densification, Morton resort and
AABB refresh run at epoch boundaries exactly on the reference's schedule.

The reference's GPU-driven feedback buffers (data.py:236-245) have no
TPU analogue -- capacities are static (config.CapacityParams) and overflow
counters are reported instead.
"""
from __future__ import annotations

import dataclasses
import functools
import time
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..ops import losses
from ..ops import pose as pose_ops
from ..ops import raster as raster_ops
from ..render import render, render_preprocess
from ..scene import cluster
from ..scene.gaussians import GaussianParams, create_gaussians, pad_params
from ..utils import math as um
from . import densify, statistics
from .optimizer import AdamState, LearningRates, init_adam, sparse_adam_step


class TrainState(NamedTuple):
    params: GaussianParams
    adam: AdamState
    active_count: jax.Array   # scalar int32 (multiple of chunk_size)
    step: jax.Array           # scalar int32 optimizer steps taken


class CameraBatch(NamedTuple):
    """Per-frame camera tensors (device-preloaded, reference data.py:178)."""

    view: jax.Array      # [F, 4, 4]
    proj: jax.Array      # [F, 4, 4]
    planes: jax.Array    # [F, 6, 4]
    center: jax.Array    # [F, 3]
    images: jax.Array    # [F, 3, H, W] float32 in [0, 1]


def masked_chunk_aabb(params: GaussianParams, active_count,
                      chunk_size: int):
    """Per-chunk AABBs with inactive chunks pushed out of every frustum."""
    import jax.nn
    scale = jnp.exp(params.scale)
    norm = jnp.sqrt(jnp.sum(params.rot ** 2, axis=0, keepdims=True))
    rot = params.rot / jnp.maximum(norm, 1e-12)
    origin, extend = cluster.chunk_aabb(params.xyz, scale, rot, chunk_size)
    nchunks = origin.shape[-1]
    chunk_active = jnp.arange(nchunks) < active_count // chunk_size
    origin = jnp.where(chunk_active, origin, 1e9)
    extend = jnp.where(chunk_active, extend, 0.0)
    return origin, extend


def make_train_step(lp: cfg.ModelParams, op: cfg.OptimizationParams,
                    pp: cfg.PipelineParams, caps: cfg.CapacityParams,
                    img_h: int, img_w: int, spatial_lr_scale: float,
                    sh_degree: int, collect_stats: bool,
                    interpret: bool = False, learnable_pose: bool = False):
    """Build the jitted per-iteration step for one static configuration.

    When ``learnable_pose`` (op.learnable_viewproj), per-frame extrinsics
    are trained jointly: the view matrix is rebuilt differentiably from the
    frame's extr row each step and updated with SparseAdam (reference
    trainer.py:84-122; note the reference's own custom ops stop all matrix
    gradients -- MVPTransform.backward returns position grads only,
    wrapper.py:278-285 -- so this path actually *works* here where the
    reference's cannot)."""
    import math as pymath
    tile_h, tile_w = pp.tile_size
    tiles_x = pymath.ceil(img_w / tile_w)
    tiles_total = pymath.ceil(img_h / tile_h) * tiles_x
    chunk_size = pp.cluster_size

    # On statistics epochs with the Pallas backend, the densification
    # statistics ride the SAME backward-kernel run and per-point reduce as
    # the parameter gradients, surfaced as the loss gradient w.r.t. a zero
    # "sink" input (ops/raster.rasterize stats_sink).  This is the TPU
    # analogue of the reference accumulating stats inside the real
    # backward (raster.cu:289-301,779-820) -- no second kernel pass.
    use_sink = collect_stats and pp.raster_backend == "pallas"

    def step(state: TrainState, stats: statistics.StatsState,
             chunk_origin, chunk_extend, view, proj, planes, center,
             gt_image, pose, frame_idx):
        def loss_from(params, view, planes, center, sink=None):
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

        sink0 = (raster_ops.zero_stats_sink(caps.visible_capacity)
                 if use_sink else None)
        g_sink = None
        if learnable_pose:
            def loss_fn(params, extr_row, sink):
                v, pl_, c = pose_ops.camera_from_extr(extr_row, proj)
                # culling planes and SH view dirs carry no pose gradient
                # (reference: frustum/no_grad dirs, render/__init__.py:40)
                return loss_from(params, v, jax.lax.stop_gradient(pl_),
                                 jax.lax.stop_gradient(c), sink)

            argnums = (0, 1, 2) if use_sink else (0, 1)
            (loss, (out, culled)), gs = jax.value_and_grad(
                loss_fn, argnums=argnums, has_aux=True)(
                    state.params, pose.extr[frame_idx], sink0)
            grads, g_extr = gs[0], gs[1]
            if use_sink:
                g_sink = gs[2]
            new_pose = pose_ops.sparse_pose_adam(pose, frame_idx, g_extr,
                                                 lr=op.pose_lr)
        else:
            argnums = (0, 1) if use_sink else 0
            (loss, (out, culled)), gs = jax.value_and_grad(
                lambda p, s: loss_from(p, view, planes, center, s),
                argnums=argnums, has_aux=True)(state.params, sink0)
            if use_sink:
                grads, g_sink = gs
            else:
                grads = gs
            new_pose = pose

        nchunks = caps.primitive_capacity // chunk_size
        chunk_mask = cluster.scatter_chunk_mask(
            culled.chunk_ids, culled.num_visible_chunks, nchunks)
        lrs = LearningRates.from_config(op, spatial_lr_scale, state.step)
        new_params, new_adam = sparse_adam_step(
            state.params, grads, state.adam, lrs, chunk_mask, chunk_size)

        # Overflow-safe stepping: a truncated binning table means truncated
        # gradients -- never train on them (the reference reallocates so a
        # step is always exact, binning.cu:137-169 / compact.cu:527-551).
        # The update becomes a no-op and the trainer retries the frame
        # after re-bucketing capacities.
        overflow = out.overflow

        def keep_old(new, old):
            return jax.tree.map(
                lambda a, b: jnp.where(overflow, b, a), new, old)

        new_params = keep_old(new_params, state.params)
        new_adam = keep_old(new_adam, state.adam)
        pose = keep_old(new_pose, pose)
        new_state = TrainState(
            params=new_params, adam=new_adam,
            active_count=state.active_count,
            step=state.step + jnp.where(overflow, 0, 1))

        if collect_stats:
            if use_sink:
                rstats = g_sink  # RasterStats off the shared VJP
            else:
                # jnp-backend fallback: re-derive the image cotangent and
                # run the explicit statistics pass (interpreted kernel)
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
            new_stats = statistics.update_stats(
                stats, culled.chunk_ids, culled.valid,
                out.primitive_visible, rstats, chunk_size)
            # overflowed frames are retried -- don't double-count stats
            stats = keep_old(new_stats, stats)

        metrics = {
            "loss": loss,
            "psnr": losses.psnr(out.img, gt_image),
            "overflow": out.overflow,
            "sizes": out.sizes,
        }
        if collect_stats:
            # per-tile blend depth (reference update_tile_blend_count,
            # statistic_helper.py:68-79; feeds complexity_sorted_tiles)
            metrics["tile_count"] = out.aux.table.tile_count
        return new_state, stats, pose, metrics

    # LITEGS_NO_DONATE: bisect aid -- buffer donation changes XLA's
    # aliasing/layout decisions, which is one of the step-context levers
    # for the streaming-kernel fault investigation (PERF.md r4 §2)
    import os as _os
    if _os.environ.get("LITEGS_NO_DONATE"):
        return jax.jit(step)
    donate = (0, 1, 9) if learnable_pose else (0, 1)
    return jax.jit(step, donate_argnums=donate)


def make_batch_train_step(lp: cfg.ModelParams, op: cfg.OptimizationParams,
                          pp: cfg.PipelineParams, caps: cfg.CapacityParams,
                          img_h: int, img_w: int, spatial_lr_scale: float,
                          sh_degree: int, batch_views: int,
                          collect_stats: bool, interpret: bool = False):
    """Jitted step consuming B views through ONE raster launch.

    The reference plumbs a batch axis through every kernel (raster.cu:182,
    B always 1 in its trainer); here B>1 amortizes the fixed per-dispatch
    costs of the many small binning/pack ops and lengthens the kernel
    grids (render_batch).  Semantics: ONE optimizer update from the mean
    gradient of B views -- identical to the mesh data-parallel step
    (parallel/__init__.py) with D=B on a single chip, including the
    union visibility mask and the all-views-poisoned overflow no-op.
    Pose refinement is not plumbed (B>1 is the throughput path).
    """
    from ..render import render_batch
    b = batch_views
    chunk_size = pp.cluster_size
    use_sink = collect_stats and pp.raster_backend == "pallas"
    assert pp.raster_backend == "pallas", "batched step is pallas-only"

    def step(state: TrainState, stats: statistics.StatsState,
             chunk_origin, chunk_extend, views, projs, planes, centers,
             gt_images):
        def loss_fn(params, sink=None):
            culled = [render_preprocess(params, chunk_origin, chunk_extend,
                                        planes[v], centers[v], sh_degree,
                                        pp, caps) for v in range(b)]
            out = render_batch(culled, [views[v] for v in range(b)],
                               [projs[v] for v in range(b)], img_h, img_w,
                               pp, caps, interpret=interpret,
                               stats_sink=sink)
            loss = 0.0
            for v in range(b):
                lv = losses.fused_l1_ssim_loss(out.imgs[v], gt_images[v],
                                               op.lambda_dssim)
                if op.reg_weight > 0.0:
                    lv = lv + jnp.mean(culled[v].scale ** 2) * op.reg_weight
                if pp.enable_transmitance:
                    lv = lv + jnp.mean(jnp.abs(1.0 - out.transmitance[v]))
                loss = loss + lv
            return loss / b, (out, culled)

        sink0 = (raster_ops.zero_stats_sink(b * caps.visible_capacity)
                 if use_sink else None)
        g_sink = None
        if use_sink:
            (loss, (out, culled)), (grads, g_sink) = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True)(state.params, sink0)
        else:
            (loss, (out, culled)), grads = jax.value_and_grad(
                loss_fn, has_aux=True)(state.params)

        nchunks = caps.primitive_capacity // chunk_size
        chunk_mask = jnp.zeros((nchunks,), bool)
        for v in range(b):
            chunk_mask |= cluster.scatter_chunk_mask(
                culled[v].chunk_ids, culled[v].num_visible_chunks, nchunks)
        lrs = LearningRates.from_config(op, spatial_lr_scale, state.step)
        new_params, new_adam = sparse_adam_step(
            state.params, grads, state.adam, lrs, chunk_mask, chunk_size)

        overflow = out.overflow

        def keep_old(new, old):
            return jax.tree.map(
                lambda a, bb: jnp.where(overflow, bb, a), new, old)

        new_params = keep_old(new_params, state.params)
        new_adam = keep_old(new_adam, state.adam)
        new_state = TrainState(
            params=new_params, adam=new_adam,
            active_count=state.active_count,
            step=state.step + jnp.where(overflow, 0, 1))

        if collect_stats:
            mv = caps.visible_capacity
            new_stats = stats
            for v in range(b):
                rv = jax.tree.map(lambda x: x[v * mv:(v + 1) * mv], g_sink)
                new_stats = statistics.update_stats(
                    new_stats, culled[v].chunk_ids, culled[v].valid,
                    out.primitive_visible[v], rv, chunk_size)
            stats = keep_old(new_stats, stats)

        psnr = sum(losses.psnr(out.imgs[v], gt_images[v])
                   for v in range(b)) / b
        metrics = {"loss": loss, "psnr": psnr, "overflow": overflow,
                   "sizes": out.sizes}
        return new_state, stats, metrics

    return jax.jit(step, donate_argnums=(0, 1))


def make_eval_render(pp: cfg.PipelineParams, caps: cfg.CapacityParams,
                     img_h: int, img_w: int, sh_degree: int,
                     interpret: bool = False):
    def eval_render(params, active_count, view, proj, planes, center):
        chunk_origin, chunk_extend = masked_chunk_aabb(
            params, active_count, pp.cluster_size)
        culled = render_preprocess(params, chunk_origin, chunk_extend,
                                   planes, center, sh_degree, pp, caps)
        out = render(culled, view, proj, img_h, img_w, pp, caps,
                     interpret=interpret)
        return out.img, out.overflow

    return jax.jit(eval_render)


class SizeFeedback:
    """Per-frame capacity-feedback signal: running maxima of each frame's
    observed (visible primitives, rows, entries), trend-extrapolated.

    The reference predicts buffer sizes from the previous epoch's value for
    the SAME camera with a 1.2x/1.5x margin (compact.cu:527-551,
    binning.cu:137-169; FramesBuffer is per-frame, data.py:236-245).  Early
    training grows per-view sizes 10-20%/epoch (splats expand from the knn
    init), so last-epoch maxima under-predict; extrapolating one epoch
    ahead at the observed per-frame growth rate (clamped to 1.5x, the
    reference's binning slack) absorbs the drift while staying tight once
    sizes plateau.  Never shrinks: a transiently small epoch must not
    thrash compiles.  Shared by the single-chip and mesh trainers.
    """

    def __init__(self, n_frames: int):
        self.n_frames = n_frames
        self.feedback = None        # np [F, 3] int64, None until seeded
        self._last = {}

    def observe(self, frame_ids, sizes: np.ndarray):
        """Record one epoch's per-frame observations ([k] ids, [k,3])."""
        if self.feedback is None:
            # seed every frame with the global max (frames not in this
            # id list have no observation yet)
            self.feedback = np.broadcast_to(
                sizes.max(axis=0), (self.n_frames, 3)).copy()
        for i, s in zip(frame_ids, sizes):
            i = int(i)
            prev = self._last.get(i)
            pred = s
            if prev is not None:
                g = np.clip(s / np.maximum(prev, 1), 1.0, 1.5)
                pred = (s * g).astype(np.int64)
            self._last[i] = s
            self.feedback[i] = np.maximum(self.feedback[i], pred)

    def predict(self, frame_ids) -> Optional[np.ndarray]:
        """Max predicted (visible, rows, entries) over a group of frames;
        None before the first observation."""
        if self.feedback is None:
            return None
        ids = [int(i) for i in np.atleast_1d(frame_ids)]
        return self.feedback[ids].max(axis=0)

    def scale(self, growth: float):
        """Densification grows every per-view size roughly with the
        primitive count; scale the feedback so the next epoch's capacity
        bucket anticipates it instead of overflowing."""
        if self.feedback is not None:
            self.feedback = (self.feedback.astype(np.float64)
                             * max(growth, 1.0)).astype(np.int64)


@dataclasses.dataclass
class Trainer:
    """Stateful driver around the functional core (epoch loop, schedules,
    densification and IO hooks), mirroring litegs.training.start."""

    lp: cfg.ModelParams
    op: cfg.OptimizationParams
    pp: cfg.PipelineParams
    dp: cfg.DensifyParams
    caps: cfg.CapacityParams
    data: CameraBatch
    spatial_lr_scale: float
    interpret: bool = False
    seed: int = 0
    # per-frame extrinsics [F, 7] (qvec+tvec); required when
    # op.learnable_viewproj -- the pose-refinement initialization
    extr_init: Optional[np.ndarray] = None

    def __post_init__(self):
        self.img_h = int(self.data.images.shape[2])
        self.img_w = int(self.data.images.shape[3])
        self.n_frames = int(self.data.images.shape[0])
        self.total_epochs = max(int(self.op.iterations) // self.n_frames, 1)
        self.densify_until = densify.densify_until_epoch(
            self.dp, self.total_epochs)
        self._step_cache = {}
        self._eval_cache = {}
        self.key = jax.random.PRNGKey(self.seed)
        self.overflow_count = 0
        # capacity feedback: per-frame running maxima of (visible
        # primitives, rows, entries) with trend extrapolation (see
        # SizeFeedback; the reference's per-camera FramesBuffer,
        # data.py:236-245)
        self.size_feedback = SizeFeedback(self.n_frames)
        self.overflow_last_epoch = False
        self._post_densify = False
        self.pose_state = None
        # per-tile max blend count over the last statistics epoch (the
        # reference's tile-complexity telemetry; on TPU the raster grid is
        # sequential so no launch reordering is needed -- kept as parity +
        # diagnostics)
        self.tile_blend_max = None
        if self.op.learnable_viewproj:
            assert self.extr_init is not None, \
                "learnable_viewproj requires extr_init ([F,7] per frame)"
            self.pose_state = pose_ops.init_pose_state(self.extr_init)
        # B>1 batched stepping (pp.batch_views): pallas-only and
        # incompatible with pose refinement -- fall back loudly to B=1
        self.batch_views = 1
        if self.pp.batch_views > 1:
            if (self.pp.raster_backend == "pallas"
                    and not self.op.learnable_viewproj):
                self.batch_views = int(self.pp.batch_views)
            else:
                print("WARNING: batch_views > 1 requires the pallas "
                      "backend without learnable_viewproj; using B=1",
                      flush=True)

    # -- setup ---------------------------------------------------------

    def init_state(self, init_xyz, init_color) -> TrainState:
        from ..scene.gaussians import pad_to_chunk
        params = create_gaussians(init_xyz, init_color, self.lp.sh_degree)
        params = pad_to_chunk(params, self.pp.cluster_size)
        self.init_points_num = params.capacity
        params = pad_params(params, self.caps.primitive_capacity)
        return TrainState(params=params, adam=init_adam(params),
                          active_count=jnp.int32(self.init_points_num),
                          step=jnp.int32(0))

    # -- helpers -------------------------------------------------------

    def _sh_degree(self, epoch: int) -> int:
        return min(epoch // 5, self.lp.sh_degree)

    def is_densify_active(self, epoch: int) -> bool:
        return (self.dp.densify_from <= epoch < self.densify_until
                and epoch % self.dp.densification_interval == 0)

    def _collect_stats(self, epoch: int) -> bool:
        """Whether this epoch's train steps collect densify statistics.

        Taming mode scores from ONE epoch of fragment statistics (the
        densify epoch itself).  Official mode follows the original-3DGS
        accumulation scheme: positional-gradient norms and visit counts
        accumulate EVERY iteration between densify events (Inria
        add_densification_stats runs each backward; accumulators are
        zeroed after each densify_and_prune -- here by the stats reset in
        epoch_boundary).  Collection rides the shared raster VJP and
        costs ~+8 ms/step (PERF.md r3), so always-on is affordable."""
        if self.dp.densify_mode == "official":
            return epoch < self.densify_until
        return self.is_densify_active(epoch)

    def _frame_caps(self, frame: int) -> cfg.CapacityParams:
        """Capacities for one frame from the per-frame feedback signal.

        The reference predicts buffer sizes from the previous epoch's value
        for the SAME camera with a 1.2x/1.5x margin (compact.cu:527-551,
        binning.cu:137-169; FramesBuffer is per-frame, data.py:236-245);
        here each frame's observed maxima pick a bucket on a geometric
        grid, so a handful of step variants serve all cameras and light
        frames don't pay the heaviest frame's padding.
        """
        pred = self.size_feedback.predict(frame)
        if not self.pp.adaptive_capacity or pred is None:
            return self.caps
        vis, rows, ents = (int(x) for x in pred)
        # Steady-state margin is tight (capacity-scale work is pure
        # overhead), but the first epoch after a densify step gets a
        # cushion: new points cluster in dense regions, so per-view sizes
        # can outgrow the active-count-scaled feedback prediction.
        margin = self.pp.capacity_margin * (
            1.5 if self.overflow_last_epoch else 1.0) * (
            1.2 if self._post_densify else 1.0)
        return cfg.bucketed_capacity(self.caps.primitive_capacity,
                                     vis, rows, ents, margin)

    def _get_step(self, sh_degree: int, collect: bool,
                  caps: cfg.CapacityParams):
        key = (sh_degree, collect, caps)
        if key not in self._step_cache:
            self._step_cache[key] = make_train_step(
                self.lp, self.op, self.pp, caps, self.img_h,
                self.img_w, self.spatial_lr_scale, sh_degree, collect,
                self.interpret,
                learnable_pose=self.op.learnable_viewproj)
        return self._step_cache[key]

    def _get_eval(self, sh_degree: int):
        if sh_degree not in self._eval_cache:
            self._eval_cache[sh_degree] = make_eval_render(
                self.pp, self.caps, self.img_h, self.img_w, sh_degree,
                self.interpret)
        return self._eval_cache[sh_degree]

    # -- B>1 batched stepping (pp.batch_views) -------------------------

    def _group_caps_max(self, ids) -> cfg.CapacityParams:
        """One capacity bundle for a B-view group: field-wise max of the
        members' per-frame buckets (all views of a batch share one
        compiled step, so the group pays its heaviest member)."""
        caps_list = [self._frame_caps(int(i)) for i in ids]
        return cfg.CapacityParams(
            primitive_capacity=self.caps.primitive_capacity,
            visible_capacity=max(c.visible_capacity for c in caps_list),
            row_capacity=max(c.row_capacity for c in caps_list),
            entry_capacity=max(c.entry_capacity for c in caps_list))

    def _get_batch_step(self, sh_degree: int, collect: bool,
                        caps: cfg.CapacityParams, b: int):
        key = (sh_degree, collect, caps, b)
        if key not in self._step_cache:
            self._step_cache[key] = make_batch_train_step(
                self.lp, self.op, self.pp, caps, self.img_h, self.img_w,
                self.spatial_lr_scale, sh_degree, batch_views=b,
                collect_stats=collect, interpret=self.interpret)
        return self._step_cache[key]

    def _run_epoch_batched(self, state, stats, epoch, frame_ids, sh_deg,
                           collect, origin, extend, _retry):
        """Epoch loop consuming batch_views frames per optimizer step
        through one raster launch (reference batch axis, raster.cu:182).
        Leftover frames (len % B) run through the single-view step so an
        epoch still sees every frame exactly once; a batch whose ANY view
        overflowed applied no update and all its frames are retried."""
        bv = self.batch_views
        ids = [int(i) for i in frame_ids]
        cut = len(ids) - len(ids) % bv
        pending = []                             # (group_ids, metrics)
        for s in range(0, cut, bv):
            g = ids[s:s + bv]
            step_fn = self._get_batch_step(sh_deg, collect,
                                           self._group_caps_max(g), bv)
            sel = jnp.asarray(g)
            state, stats, metrics = step_fn(
                state, stats, origin, extend, self.data.view[sel],
                self.data.proj[sel], self.data.planes[sel],
                self.data.center[sel], self.data.images[sel])
            pending.append((g, metrics))
        for i in ids[cut:]:
            step_fn = self._get_step(sh_deg, collect, self._frame_caps(i))
            state, stats, self.pose_state, metrics = step_fn(
                state, stats, origin, extend, self.data.view[i],
                self.data.proj[i], self.data.planes[i],
                self.data.center[i], self.data.images[i],
                self.pose_state, jnp.int32(i))
            pending.append(([i], metrics))
        got = jax.device_get([m for _, m in pending])
        overflowed = []
        for (g, _), m in zip(pending, got):
            self.size_feedback.observe(
                np.asarray(g),
                np.asarray(m["sizes"]).reshape(len(g), 3).astype(np.int64))
            if bool(m["overflow"]):
                overflowed.extend(g)
        n_over = len(overflowed)
        self.overflow_count += n_over
        self.overflow_last_epoch = n_over > 0
        if overflowed and self.pp.adaptive_capacity and _retry < 3:
            state, stats, _ = self.run_epoch(state, stats, epoch,
                                             frame_ids=overflowed,
                                             _retry=_retry + 1)
        elif overflowed:
            print(f"[epoch {epoch}] WARNING: {n_over} view(s) overflowed "
                  "static capacities; their updates were skipped "
                  "(raise caps or enable adaptive_capacity)", flush=True)
        if _retry == 0:
            self._post_densify = False
        return state, stats, {
            "loss": float(np.mean([g["loss"] for g in got])),
            "psnr": float(np.mean([g["psnr"] for g in got]))}

    # -- main loop -----------------------------------------------------

    def run_epoch(self, state: TrainState, stats, epoch: int,
                  frame_ids=None, _retry: int = 0):
        """Train one epoch; returns (state, stats, mean_metrics).

        Metrics stay on device until the epoch ends (one readback per
        epoch) -- the steady-state loop never host-syncs, mirroring the
        reference's GPU-driven discipline (SURVEY.md layer map note 3).
        Frames whose binning overflowed are retried (see overflow-safe
        stepping in make_train_step).
        """
        sh_deg = self._sh_degree(epoch)
        collect = self._collect_stats(epoch)
        origin, extend = masked_chunk_aabb(state.params, state.active_count,
                                           self.pp.cluster_size)
        if frame_ids is None:
            self.key, sub = jax.random.split(self.key)
            frame_ids = np.asarray(
                jax.random.permutation(sub, self.n_frames))
        if self.batch_views > 1:
            return self._run_epoch_batched(state, stats, epoch, frame_ids,
                                           sh_deg, collect, origin, extend,
                                           _retry)
        pending = []
        for i in frame_ids:
            i = int(i)
            step_fn = self._get_step(sh_deg, collect, self._frame_caps(i))
            state, stats, self.pose_state, metrics = step_fn(
                state, stats, origin, extend, self.data.view[i],
                self.data.proj[i], self.data.planes[i],
                self.data.center[i], self.data.images[i],
                self.pose_state, jnp.int32(i))
            pending.append(metrics)
        got = jax.device_get(pending)
        overflowed = [int(i) for i, g in zip(frame_ids, got)
                      if bool(g["overflow"])]
        n_over = len(overflowed)
        self.overflow_count += n_over
        self.overflow_last_epoch = n_over > 0
        sizes = np.stack([g["sizes"] for g in got])      # [len(ids), 3]
        if "tile_count" in got[0]:
            self.tile_blend_max = np.max(
                np.stack([g["tile_count"] for g in got]), axis=0)
        self.size_feedback.observe(frame_ids, sizes)

        # Overflowed frames had their update skipped (overflow-safe step);
        # retrain them with re-bucketed capacities so no iteration ever
        # trains on a truncated table (reference never-truncate discipline,
        # binning.cu:137-169).
        if overflowed and self.pp.adaptive_capacity and _retry < 3:
            state, stats, _ = self.run_epoch(state, stats, epoch,
                                             frame_ids=overflowed,
                                             _retry=_retry + 1)
        elif overflowed:
            # static caps: the overflow-safe step applied NO update for
            # these views and a retry would hit the same capacities -- be
            # loud, the run is silently dropping training signal
            print(f"[epoch {epoch}] WARNING: {n_over} view(s) overflowed "
                  "static capacities; their updates were skipped "
                  "(raise caps or enable adaptive_capacity)", flush=True)
        if _retry == 0:
            self._post_densify = False  # cushion lasts one epoch
        return state, stats, {
            "loss": float(np.mean([g["loss"] for g in got])),
            "psnr": float(np.mean([g["psnr"] for g in got]))}

    def epoch_boundary(self, state: TrainState, stats, epoch: int):
        """Morton resort + AABB refresh + densification on the reference
        schedule (trainer.py:101-106, 201)."""
        # densification (end of epoch)
        self.key, sub = jax.random.split(self.key)
        old_active = int(state.active_count)
        params, adam, active, did = densify.densify_step(
            state.params, state.adam, stats, state.active_count, epoch,
            sub, self.dp, self.densify_until, self.init_points_num,
            self.spatial_lr_scale, self.pp.cluster_size)
        if did:
            stats = statistics.init_stats(self.caps.primitive_capacity)
            if old_active > 0:
                self.size_feedback.scale(int(active) / old_active)
            self._post_densify = True
        state = TrainState(params=params, adam=adam, active_count=active,
                           step=state.step)
        # Morton resort runs at the START of epoch e when
        # (e - 1) % interval == 0; doing it here at the end of epoch e-1
        # is the same schedule.
        if self.pp.cluster_size > 0 and (
                epoch % self.dp.densification_interval == 0):
            params, adam = densify.spatial_refine(state.params, state.adam,
                                                  state.active_count)
            state = TrainState(params=params, adam=adam,
                               active_count=state.active_count,
                               step=state.step)
        return state, stats

    def train(self, init_xyz, init_color, test_epochs=(), log_every=1,
              test_data: Optional[CameraBatch] = None, verbose=True):
        state = self.init_state(init_xyz, init_color)
        stats = statistics.init_stats(self.caps.primitive_capacity)
        history = []
        t0 = time.time()
        for epoch in range(self.total_epochs):
            state, stats, metrics = self.run_epoch(state, stats, epoch)
            state, stats = self.epoch_boundary(state, stats, epoch)
            metrics["epoch"] = epoch
            metrics["active"] = int(state.active_count)
            history.append(metrics)
            if verbose and (epoch % log_every == 0
                            or epoch == self.total_epochs - 1):
                print(f"[epoch {epoch}] loss={metrics['loss']:.4f} "
                      f"psnr={metrics['psnr']:.2f} "
                      f"active={metrics['active']}", flush=True)
            if epoch in test_epochs and test_data is not None:
                psnr = self.evaluate(state, test_data, epoch)
                if verbose:
                    print(f"[epoch {epoch}] test PSNR {psnr:.2f}",
                          flush=True)
        elapsed = time.time() - t0
        if verbose:
            print(f"training took {elapsed:.1f}s "
                  f"({self.total_epochs * self.n_frames} iterations, "
                  f"overflows={self.overflow_count})", flush=True)
        return state, stats, history

    def complexity_sorted_tiles(self):
        """Tile ids in descending blend-depth order from the last
        statistics epoch (reference StatisticsHelper sorted tile list,
        statistic_helper.py:68-79), or None before any stats epoch."""
        if self.tile_blend_max is None:
            return None
        return np.argsort(-self.tile_blend_max)

    def evaluate(self, state: TrainState, data: CameraBatch,
                 epoch: int) -> float:
        eval_fn = self._get_eval(self._sh_degree(epoch))
        psnrs = []
        for i in range(data.images.shape[0]):
            img, _ = eval_fn(state.params, state.active_count, data.view[i],
                             data.proj[i], data.planes[i], data.center[i])
            psnrs.append(float(losses.psnr(img, data.images[i])))
        return float(np.mean(psnrs))

    # -- IO normalization hooks (identity here; the ParallelTrainer
    # gathers/re-places its sharded leaves through the same interface so
    # training.start() can checkpoint either trainer uniformly) --------
    def init_stats(self):
        return statistics.init_stats(self.caps.primitive_capacity)

    def stats_for_io(self, stats):
        return stats

    def stats_from_io(self, host_stats):
        return host_stats

    def state_from_io(self, state: TrainState) -> TrainState:
        return state


def camera_batch_from_frames(cam, frames, images) -> CameraBatch:
    """Host-side camera tensors from data.camera objects."""
    proj = cam.proj_matrix()
    views = np.stack([f.view_matrix() for f in frames])
    planes = np.stack([f.frustumplane(proj) for f in frames])
    centers = np.stack([f.camera_center() for f in frames])
    return CameraBatch(
        view=jnp.asarray(views, jnp.float32),
        proj=jnp.asarray(np.broadcast_to(proj, views.shape), jnp.float32),
        planes=jnp.asarray(planes, jnp.float32),
        center=jnp.asarray(centers, jnp.float32),
        images=jnp.asarray(images, jnp.float32),
    )
