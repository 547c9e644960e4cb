"""Multi-chip training driver: the epoch loop over a device mesh.

The single-chip Trainer (training/trainer.py) consumes one view per
optimizer step, mirroring the reference's DataLoader(batch_size=1) loop
(litegs/training/trainer.py:111-163).  At mesh scale each step consumes
D views -- one per chip -- with the mean gradient psum'd over ICI, so an
"epoch" of F frames is ceil(F/D) steps (the last group pads with
zero-weight duplicate frames when D does not divide F).  Everything
stateful stays replicated except the densification statistics, which live
sharded over the primitive axis and feed the sharded densify pass
(parallel/densify.py).

Production discipline matches the single-chip trainer:

* **overflow retry** -- a step group whose binning overflowed applied NO
  optimizer update (the step is a global no-op); the group is retried
  with re-bucketed capacities so no view is ever trained truncated or
  silently dropped (reference never-truncate discipline,
  binning.cu:137-169).
* **adaptive capacity buckets** -- per-frame size feedback (shared
  SizeFeedback helper) picks each GROUP's capacities as the max of its
  frames' predictions on the geometric bucket grid, so light groups do
  not pay the heaviest frame's padding; step variants compile per
  (sh_degree, collect, caps) like the single-chip trainer.
* **eval / checkpoint / ply hooks** -- `evaluate` renders a held-out
  batch from the replicated state; `state_for_io` / `stats_for_io`
  expose host-side pytrees for io.checkpoint / io.ply.

Semantics difference vs sequential (documented in parallel/__init__.py):
one mean-gradient update replaces D sequential updates.  Measured
(CONVERGENCE_r2.md, pinned by tests/test_parallel_trainer.py): at equal
optimizer updates the parallel run matches or exceeds sequential with NO
lr scaling; at equal images it is update-starved and lr scaling does not
help (Adam is gradient-scale invariant), so provision schedules in
optimizer updates, not images.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..training import densify as tdensify
from ..training import statistics
from ..training.trainer import (CameraBatch, SizeFeedback, TrainState,
                                make_eval_render, masked_chunk_aabb)
from ..ops import losses
from . import (DATA_AXIS, make_mesh, make_parallel_train_step, replicate,
               shard_camera_batch)
from . import densify as pdensify


@dataclasses.dataclass
class ParallelTrainer:
    """Data-parallel trainer over a mesh (primitive capacity fixed per
    run; binning capacities re-bucketed per step group)."""

    lp: cfg.ModelParams
    op: cfg.OptimizationParams
    pp: cfg.PipelineParams
    dp: cfg.DensifyParams
    caps: cfg.CapacityParams
    data: CameraBatch
    spatial_lr_scale: float
    mesh: object = None
    n_devices: Optional[int] = None
    # lr multiplier for the D-views-per-update semantics.  Measured
    # (CONVERGENCE_r2.md): at equal optimizer updates the mean-gradient
    # step needs NO scaling (and sqrt(D)/linear scaling hurt -- Adam is
    # already gradient-scale invariant), so the default is 1.0.
    lr_scale: float = 1.0
    interpret: bool = False
    seed: int = 0

    def __post_init__(self):
        if self.mesh is None:
            self.mesh = make_mesh(self.n_devices)
        self.d = int(self.mesh.devices.size)
        self.img_h = int(self.data.images.shape[2])
        self.img_w = int(self.data.images.shape[3])
        self.n_frames = int(self.data.images.shape[0])
        # one epoch sees every frame once = ceil(F/D) steps of <= D live
        # views (the remainder group pads with zero-weight duplicates)
        self.steps_per_epoch = -(-self.n_frames // self.d)
        self.total_epochs = max(
            int(self.op.iterations) // self.n_frames, 1)
        self.densify_until = tdensify.densify_until_epoch(
            self.dp, self.total_epochs)
        self._step_cache = {}
        self._eval_cache = {}
        self.key = jax.random.PRNGKey(self.seed)
        self.overflow_count = 0
        self.size_feedback = SizeFeedback(self.n_frames)
        self.overflow_last_epoch = False
        self._post_densify = False
        # pose refinement is single-chip-only for now (the pose state is
        # per-frame and would need a sharded optimizer); start() falls
        # back to Trainer when op.learnable_viewproj is set
        self.pose_state = None
        assert not self.op.learnable_viewproj, \
            "learnable_viewproj is not supported by ParallelTrainer"

    def init_state(self, init_xyz, init_color) -> TrainState:
        from ..scene.gaussians import (create_gaussians, pad_params,
                                       pad_to_chunk)
        from ..training.optimizer import init_adam
        params = create_gaussians(init_xyz, init_color, self.lp.sh_degree)
        params = pad_to_chunk(params, self.pp.cluster_size)
        self.init_points_num = params.capacity
        params = pad_params(params, self.caps.primitive_capacity)
        state = TrainState(params=params, adam=init_adam(params),
                           active_count=jnp.int32(self.init_points_num),
                           step=jnp.int32(0))
        return replicate(self.mesh, state)

    def init_stats(self):
        return pdensify.init_sharded_stats(self.mesh,
                                           self.caps.primitive_capacity)

    def _sh_degree(self, epoch: int) -> int:
        return min(epoch // 5, self.lp.sh_degree)

    def is_densify_active(self, epoch: int) -> bool:
        return (self.dp.densify_from <= epoch < self.densify_until
                and epoch % self.dp.densification_interval == 0)

    def _collect_stats(self, epoch: int) -> bool:
        """Official mode accumulates grad norms every iteration between
        densify events (original-3DGS semantics; see
        training.trainer.Trainer._collect_stats)."""
        if self.dp.densify_mode == "official":
            return epoch < self.densify_until
        return self.is_densify_active(epoch)

    def _group_caps(self, ids) -> cfg.CapacityParams:
        """Capacities for one group of frames: max of the group's
        per-frame predictions on the geometric bucket grid (single-chip
        counterpart: Trainer._frame_caps)."""
        pred = self.size_feedback.predict(ids)
        if not self.pp.adaptive_capacity or pred is None:
            return self.caps
        vis, rows, ents = (int(x) for x in pred)
        margin = self.pp.capacity_margin * (
            1.5 if self.overflow_last_epoch else 1.0) * (
            1.2 if self._post_densify else 1.0)
        return cfg.bucketed_capacity(self.caps.primitive_capacity,
                                     vis, rows, ents, margin)

    def _get_step(self, sh_degree: int, collect: bool,
                  caps: cfg.CapacityParams):
        k = (sh_degree, collect, caps)
        if k not in self._step_cache:
            self._step_cache[k] = make_parallel_train_step(
                self.lp, self.op, self.pp, caps, self.img_h,
                self.img_w, self.spatial_lr_scale, sh_degree, collect,
                self.mesh, interpret=self.interpret, sharded_stats=True,
                lr_scale=self.lr_scale)
        return self._step_cache[k]

    def _frame_group(self, ids):
        """Camera tensors for a group of D frame indices, sharded."""
        b = self.data
        sel = jnp.asarray(ids)
        return shard_camera_batch(
            self.mesh, b.view[sel], b.proj[sel], b.planes[sel],
            b.center[sel], b.images[sel])

    def _epoch_groups(self, epoch: int):
        """Shuffled frame order cut into D-sized groups; the remainder
        group pads with wrap-around duplicates at weight 0."""
        self.key, sub = jax.random.split(self.key)
        order = np.asarray(jax.random.permutation(sub, self.n_frames))
        groups = []
        for s in range(0, self.n_frames, self.d):
            ids = order[s:s + self.d]
            w = np.ones(len(ids), np.float32)
            if len(ids) < self.d:
                pad = self.d - len(ids)
                reps = -(-pad // self.n_frames)
                fill = np.tile(order, reps)[:pad]
                ids = np.concatenate([ids, fill])
                w = np.concatenate([w, np.zeros(pad, np.float32)])
            groups.append((ids, w))
        return groups

    def run_epoch(self, state, stats, epoch: int, groups=None,
                  _retry: int = 0):
        """Train one epoch; returns (state, stats, mean_metrics).

        Groups whose step overflowed (a global no-op update) are retried
        with re-bucketed capacities, mirroring the single-chip trainer's
        never-train-on-truncated discipline (trainer.py run_epoch)."""
        sh_deg = self._sh_degree(epoch)
        collect = self._collect_stats(epoch)
        origin, extend = masked_chunk_aabb(state.params, state.active_count,
                                           self.pp.cluster_size)
        origin, extend = replicate(self.mesh, (origin, extend))
        if groups is None:
            groups = self._epoch_groups(epoch)
        pending = []
        for ids, w in groups:
            caps = self._group_caps(ids)
            step_fn = self._get_step(sh_deg, collect, caps)
            view, proj, planes, center, gt = self._frame_group(ids)
            (wt,) = shard_camera_batch(self.mesh, jnp.asarray(w))
            state, stats, metrics = step_fn(state, stats, origin, extend,
                                            view, proj, planes, center,
                                            gt, wt)
            pending.append(metrics)
        got = jax.device_get(pending)
        overflowed = []
        for (ids, w), g in zip(groups, got):
            live = w > 0
            self.size_feedback.observe(
                np.asarray(ids)[live],
                np.asarray(g["sizes"])[live].astype(np.int64))
            if bool(g["overflow"]):
                overflowed.append((ids, w))
        n_over = len(overflowed)
        self.overflow_count += n_over
        self.overflow_last_epoch = n_over > 0
        if overflowed and self.pp.adaptive_capacity and _retry < 3:
            state, stats, _ = self.run_epoch(state, stats, epoch,
                                             groups=overflowed,
                                             _retry=_retry + 1)
        elif overflowed:
            # static caps: see Trainer.run_epoch -- skipped updates must
            # not pass silently
            print(f"[epoch {epoch}] WARNING: {n_over} group(s) overflowed "
                  "static capacities; their updates were skipped "
                  "(raise caps or enable adaptive_capacity)", flush=True)
        if _retry == 0:
            self._post_densify = False  # cushion lasts one epoch
        return state, stats, {
            "loss": float(np.mean([g["loss"] for g in got])),
            "psnr": float(np.mean([g["psnr"] for g in got]))}

    def epoch_boundary(self, state, stats, epoch: int):
        self.key, sub = jax.random.split(self.key)
        old_active = int(state.active_count)
        params, adam, active, did = pdensify.sharded_densify_step(
            self.mesh, state.params, state.adam, stats,
            state.active_count, epoch, sub, self.dp, self.densify_until,
            self.init_points_num, self.spatial_lr_scale,
            self.pp.cluster_size)
        if did:
            stats = self.init_stats()
            if old_active > 0:
                self.size_feedback.scale(int(active) / old_active)
            self._post_densify = True
        state = TrainState(params=params, adam=adam, active_count=active,
                           step=state.step)
        if self.pp.cluster_size > 0 and (
                epoch % self.dp.densification_interval == 0):
            params, adam = tdensify.spatial_refine(
                state.params, state.adam, state.active_count)
            state = TrainState(params=params, adam=adam,
                               active_count=state.active_count,
                               step=state.step)
        return state, stats

    # -- IO / eval hooks (parity with the single-chip Trainer) ----------

    def _get_eval(self, sh_degree: int):
        if sh_degree not in self._eval_cache:
            self._eval_cache[sh_degree] = make_eval_render(
                self.pp, self.caps, self.img_h, self.img_w, sh_degree,
                self.interpret)
        return self._eval_cache[sh_degree]

    def evaluate(self, state, data: CameraBatch, epoch: int) -> float:
        """Mean test PSNR from the replicated state (single-device eval
        render per frame; the state is replicated so any chip serves)."""
        eval_fn = self._get_eval(self._sh_degree(epoch))
        psnrs = []
        for i in range(data.images.shape[0]):
            img, _ = eval_fn(state.params, state.active_count,
                             data.view[i], data.proj[i],
                             data.planes[i], data.center[i])
            psnrs.append(float(losses.psnr(img, data.images[i])))
        return float(np.mean(psnrs))

    def stats_for_io(self, stats) -> statistics.StatsState:
        """Gather the sharded stats accumulators to host arrays (for
        checkpointing; re-shard on load with `stats_from_io`)."""
        return jax.tree.map(lambda x: np.asarray(x), stats)

    def stats_from_io(self, host_stats) -> statistics.StatsState:
        sharded = self.init_stats()
        return jax.tree.map(
            lambda tmpl, h: jax.device_put(jnp.asarray(h), tmpl.sharding),
            sharded, host_stats)

    def state_from_io(self, state: TrainState) -> TrainState:
        """Replicate a host/in-memory TrainState onto the mesh (checkpoint
        resume path of training.start)."""
        return replicate(self.mesh, state)

    def train(self, init_xyz, init_color, verbose=True):
        state = self.init_state(init_xyz, init_color)
        stats = self.init_stats()
        history = []
        t0 = time.time()
        for epoch in range(self.total_epochs):
            state, stats, metrics = self.run_epoch(state, stats, epoch)
            state, stats = self.epoch_boundary(state, stats, epoch)
            metrics["epoch"] = epoch
            metrics["active"] = int(state.active_count)
            history.append(metrics)
            if verbose:
                print(f"[epoch {epoch}] loss={metrics['loss']:.4f} "
                      f"psnr={metrics['psnr']:.2f} "
                      f"active={metrics['active']}", flush=True)
        if verbose:
            print(f"parallel training took {time.time()-t0:.1f}s "
                  f"(D={self.d}, lr_scale={self.lr_scale:.2f}, "
                  f"overflows={self.overflow_count})", flush=True)
        return state, stats, history
