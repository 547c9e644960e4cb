"""Sparse Adam optimizer and learning-rate schedule.

TPU redesign of the reference SparseGaussianAdam + Scheduler
(litegs/training/optimizer.py:9-95, kernel compact.cu:320-417).  Exact
semantics preserved:

* plain exponential moving averages, NO bias correction, step =
  -lr * m / (sqrt(v) + eps) with eps (1e-15) outside the sqrt;
* only *visible* chunks are updated -- moments of culled chunks are neither
  decayed nor applied (the CUDA kernel scatters by visible chunk id; here a
  per-chunk boolean mask selects lanes, which is the natural TPU form);
* per-group learning rates (optimizer.py:79-86) with the xyz rate following
  a log-linear decay over steps (optimizer.py:54-61).
"""
from __future__ import annotations

import math
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..scene.gaussians import GaussianParams

BETA1, BETA2 = 0.9, 0.999
EPS = 1e-15


class AdamState(NamedTuple):
    exp_avg: GaussianParams
    exp_avg_sq: GaussianParams


def init_adam(params: GaussianParams) -> AdamState:
    # distinct buffers: donated arguments must not alias
    return AdamState(exp_avg=jax.tree.map(jnp.zeros_like, params),
                     exp_avg_sq=jax.tree.map(jnp.zeros_like, params))


class LearningRates(NamedTuple):
    """Per-group learning rates; xyz is a traced scalar (scheduled)."""

    xyz: jax.Array
    scale: float
    rot: float
    sh_0: float
    sh_rest: float
    opacity: float

    @classmethod
    def from_config(cls, op, spatial_lr_scale: float, step):
        return cls(
            xyz=xyz_lr(op, spatial_lr_scale, step),
            scale=op.scaling_lr,
            rot=op.rotation_lr,
            sh_0=op.feature_lr,
            sh_rest=op.feature_lr / 10.0,
            opacity=op.opacity_lr,
        )


def xyz_lr(op, spatial_lr_scale: float, step):
    """Log-lerp schedule (reference optimizer.py:54-61): interpolate
    between init and final rates in log space over position_lr_max_steps."""
    t = jnp.clip(step / op.position_lr_max_steps, 0.0, 1.0)
    log_lerp = jnp.exp(math.log(op.position_lr_init * spatial_lr_scale)
                       * (1 - t)
                       + math.log(op.position_lr_final * spatial_lr_scale)
                       * t)
    return log_lerp


def sparse_adam_step(params: GaussianParams, grads: GaussianParams,
                     state: AdamState, lrs: LearningRates,
                     chunk_mask, chunk_size: int
                     ) -> tuple[GaussianParams, AdamState]:
    """One masked Adam step.

    Args:
      chunk_mask: [N // chunk_size] bool -- chunks visible this iteration
        (reference passes visible chunk ids to the CUDA kernel; a lane mask
        is equivalent and branch-free).
    """
    prim_mask = jnp.repeat(chunk_mask, chunk_size)

    def upd(p, g, m, v, lr):
        mask = jnp.broadcast_to(prim_mask, p.shape)
        m_new = jnp.where(mask, BETA1 * m + (1 - BETA1) * g, m)
        v_new = jnp.where(mask, BETA2 * v + (1 - BETA2) * g * g, v)
        step = -lr * m_new / (jnp.sqrt(v_new) + EPS)
        p_new = jnp.where(mask, p + step, p)
        return p_new, m_new, v_new

    lr_tree = GaussianParams(xyz=lrs.xyz, scale=lrs.scale, rot=lrs.rot,
                             sh_0=lrs.sh_0, sh_rest=lrs.sh_rest,
                             opacity=lrs.opacity)
    out = jax.tree.map(upd, params, grads, state.exp_avg, state.exp_avg_sq,
                       lr_tree)
    new_params = GaussianParams(*[o[0] for o in out])
    new_m = GaussianParams(*[o[1] for o in out])
    new_v = GaussianParams(*[o[2] for o in out])
    return new_params, AdamState(exp_avg=new_m, exp_avg_sq=new_v)
