"""Differentiable camera: extrinsics -> view/frustum/center, plus the
sparse per-frame pose optimizer.

TPU equivalent of the reference's CreateViewProj fused op
(wrapper.py:772-791, kernel compact.cu:17-316: camera quaternion +
translation -> view/proj/viewproj/frustum with the full
quaternion-normalization gradient) and the pose-optimization path in the
trainer (trainer.py:84-122: per-frame extr embedding trained with
SparseAdam lr=1e-4; the intrinsics optimizer exists but its step is
disabled, so intrinsics stay fixed here too).  The quat-normalize VJP the
CUDA kernel hand-derives comes for free from JAX autodiff.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import math as um

POSE_LR = 1e-4   # reference trainer.py:89
BETA1, BETA2, EPS = 0.9, 0.999, 1e-8


def quat_to_rotmat(q):
    """Unit quaternion (w,x,y,z) -> rotation matrix [3,3] (jnp,
    differentiable; same formula as utils.math.qvec2rotmat)."""
    w, x, y, z = q[0], q[1], q[2], q[3]
    return jnp.stack([
        jnp.stack([1 - 2 * (y * y + z * z), 2 * (x * y - w * z),
                   2 * (x * z + w * y)]),
        jnp.stack([2 * (x * y + w * z), 1 - 2 * (x * x + z * z),
                   2 * (y * z - w * x)]),
        jnp.stack([2 * (x * z - w * y), 2 * (y * z + w * x),
                   1 - 2 * (x * x + y * y)]),
    ])


def camera_from_extr(extr, proj):
    """extr [7] = (qvec wxyz, tvec) -> (view [4,4], planes [6,4],
    center [3]), all differentiable w.r.t. extr (planes are consumed by
    culling, which the caller stop-grads, matching the reference where the
    frustum output of CreateViewProj carries no gradient path)."""
    q = extr[:4]
    q = q / jnp.maximum(jnp.linalg.norm(q), 1e-12)
    t = extr[4:7]
    R = quat_to_rotmat(q)                       # world -> cam
    view = jnp.zeros((4, 4), extr.dtype)
    view = view.at[:3, :3].set(R.T)             # row-vector form (M^T)
    view = view.at[3, :3].set(t)
    view = view.at[3, 3].set(1.0)
    hi = jax.lax.Precision.HIGHEST   # TPU matmuls default to bf16
    center = -jnp.matmul(R.T, t, precision=hi)
    planes = um.viewproj_to_frustumplane(
        jnp.matmul(view, proj, precision=hi))
    return view, planes, center


class PoseState(NamedTuple):
    """Per-frame learnable extrinsics + sparse Adam moments."""

    extr: jax.Array   # [F, 7]
    m: jax.Array      # [F, 7]
    v: jax.Array      # [F, 7]
    step: jax.Array   # scalar int32


def init_pose_state(extr_init) -> PoseState:
    extr = jnp.asarray(extr_init, jnp.float32)
    return PoseState(extr=extr, m=jnp.zeros_like(extr),
                     v=jnp.zeros_like(extr), step=jnp.int32(0))


def sparse_pose_adam(pose: PoseState, frame_idx, grad_row,
                     lr: float = POSE_LR) -> PoseState:
    """SparseAdam row update (torch.optim.SparseAdam semantics: only the
    touched row's moments advance; bias correction uses the global step)."""
    step = pose.step + 1
    m_row = BETA1 * pose.m[frame_idx] + (1 - BETA1) * grad_row
    v_row = BETA2 * pose.v[frame_idx] + (1 - BETA2) * grad_row * grad_row
    t = step.astype(jnp.float32)
    corr = jnp.sqrt(1 - BETA2 ** t) / (1 - BETA1 ** t)
    upd = lr * corr * m_row / (jnp.sqrt(v_row) + EPS)
    return PoseState(extr=pose.extr.at[frame_idx].add(-upd),
                     m=pose.m.at[frame_idx].set(m_row),
                     v=pose.v.at[frame_idx].set(v_row),
                     step=step)
