"""Multi-chip training driver: the epoch loop over a device mesh.

The single-chip Trainer (training/trainer.py) consumes one view per
optimizer step, mirroring the reference's DataLoader(batch_size=1) loop
(litegs/training/trainer.py:111-163).  At mesh scale each step consumes
D views -- one per chip -- with the mean gradient psum'd over ICI, so an
"epoch" of F frames is F/D steps.  Everything stateful stays replicated
except the densification statistics, which live sharded over the
primitive axis and feed the sharded densify pass (parallel/densify.py).

Semantics difference vs sequential (documented in parallel/__init__.py):
one mean-gradient update replaces D sequential updates.  Measured
(CONVERGENCE_r2.md): at equal optimizer updates the parallel run matches
or exceeds sequential with NO lr scaling; at equal images it is
update-starved and lr scaling does not help (Adam is gradient-scale
invariant), so provision schedules in optimizer updates, not images.
"""
from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .. import config as cfg
from ..ops import losses
from ..training import densify as tdensify
from ..training import statistics
from ..training.trainer import CameraBatch, TrainState, masked_chunk_aabb
from . import (DATA_AXIS, make_mesh, make_parallel_train_step, replicate,
               shard_camera_batch)
from . import densify as pdensify


@dataclasses.dataclass
class ParallelTrainer:
    """Data-parallel trainer over a mesh (capacities fixed per run)."""

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
        assert self.n_frames % self.d == 0, \
            f"frames ({self.n_frames}) must be a multiple of mesh size " \
            f"({self.d}) -- pad or drop frames"
        # one epoch sees every frame once = F/D steps of D views
        self.steps_per_epoch = self.n_frames // self.d
        self.total_epochs = max(
            int(self.op.iterations) // self.n_frames, 1)
        self.densify_until = tdensify.densify_until_epoch(
            self.dp, self.total_epochs)
        self._step_cache = {}
        self.key = jax.random.PRNGKey(self.seed)
        self.overflow_count = 0
        # camera tensors once: sharded over the data axis per step group
        self._sharded = None

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

    def _get_step(self, sh_degree: int, collect: bool):
        k = (sh_degree, collect)
        if k not in self._step_cache:
            self._step_cache[k] = make_parallel_train_step(
                self.lp, self.op, self.pp, self.caps, self.img_h,
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

    def run_epoch(self, state, stats, epoch: int):
        sh_deg = self._sh_degree(epoch)
        collect = self._collect_stats(epoch)
        step_fn = self._get_step(sh_deg, collect)
        origin, extend = masked_chunk_aabb(state.params, state.active_count,
                                           self.pp.cluster_size)
        origin, extend = replicate(self.mesh, (origin, extend))
        self.key, sub = jax.random.split(self.key)
        order = np.asarray(jax.random.permutation(sub, self.n_frames))
        pending = []
        for s in range(self.steps_per_epoch):
            group = order[s * self.d:(s + 1) * self.d]
            view, proj, planes, center, gt = self._frame_group(group)
            state, stats, metrics = step_fn(state, stats, origin, extend,
                                            view, proj, planes, center, gt)
            pending.append(metrics)
        got = jax.device_get(pending)
        self.overflow_count += sum(int(g["overflow"]) for g in got)
        return state, stats, {
            "loss": float(np.mean([g["loss"] for g in got])),
            "psnr": float(np.mean([g["psnr"] for g in got]))}

    def epoch_boundary(self, state, stats, epoch: int):
        self.key, sub = jax.random.split(self.key)
        params, adam, active, did = pdensify.sharded_densify_step(
            self.mesh, state.params, state.adam, stats,
            state.active_count, epoch, sub, self.dp, self.densify_until,
            self.init_points_num, self.spatial_lr_scale,
            self.pp.cluster_size)
        if did:
            stats = pdensify.init_sharded_stats(
                self.mesh, self.caps.primitive_capacity)
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

    def train(self, init_xyz, init_color, verbose=True):
        state = self.init_state(init_xyz, init_color)
        stats = pdensify.init_sharded_stats(self.mesh,
                                            self.caps.primitive_capacity)
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
