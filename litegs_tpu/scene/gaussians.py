"""Gaussian primitive storage and initialization.

TPU-native design decisions vs. the reference (litegs/scene/point.py):

* Parameters live in a struct-of-arrays NamedTuple pytree, channel-first
  ``[C, N]`` (the reference's layout, which is also TPU lane-major: N on the
  128-lane minor axis).
* N is a *static capacity* padded to a multiple of ``chunk_size * 128``; an
  ``active_count`` scalar masks the live prefix.  The reference grows/shrinks
  tensors dynamically during densification (densify.py:36-98); under XLA we
  keep shapes fixed so the whole train step stays jit-stable.
* k-NN scale init: the reference uses a CUDA Morton-bucketed 3-NN
  (simple-knn/simple_knn.cu:186-222).  Init is a one-off, so we use an exact
  chunked brute-force 3-NN in jnp -- O(N^2) but tiled through the MXU via
  squared-distance matmuls; ~1-2 s for 200k COLMAP seed points.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils import sh as sh_utils


class GaussianParams(NamedTuple):
    """Raw (pre-activation) gaussian parameters, channel-first.

    Shapes (N = primitive capacity):
      xyz:     [3, N]   world positions
      scale:   [3, N]   log-scales (exp activation)
      rot:     [4, N]   unnormalized quaternions (w,x,y,z)
      sh_0:    [1, 3, N] DC spherical-harmonic coefficients
      sh_rest: [K*3, N] higher-order SH, K = (deg+1)**2 - 1, stored FLAT
               coefficient-major (band k channel c at row (k-1)*3 + c).
               A 2-D tensor has exactly one sensible N-minor layout, so
               XLA never inserts [K, 3, N] dim-order relayout copies
               between the SH eval, the Adam update, and the chunk
               gather/scatter VJP (~8 ms/step at 1M points, HLO trace
               reshape.59/.1171/.1173 + copy.184/.190 in PERF.md r3).
      opacity: [1, N]   logit opacities (sigmoid activation)
    """

    xyz: jax.Array
    scale: jax.Array
    rot: jax.Array
    sh_0: jax.Array
    sh_rest: jax.Array
    opacity: jax.Array

    @property
    def capacity(self) -> int:
        return self.xyz.shape[-1]

    @property
    def sh_degree(self) -> int:
        return int(round((self.sh_rest.shape[0] // 3 + 1) ** 0.5)) - 1


def knn_mean_sq_dist(xyz: jax.Array, k: int = 3,
                     block: int | None = None) -> jax.Array:
    """Mean squared distance to the k nearest neighbors per point.

    Args:
      xyz: [N, 3] positions.
    Returns:
      [N] mean of the k smallest non-self squared distances (the quantity
      distCUDA2 returns in the reference, simple-knn/spatial.cu:15-26).
    """
    n = xyz.shape[0]
    if block is None:
        # one scan step materializes a [block, N] f32 distance matrix;
        # cap it at ~2 GB so million-point clouds don't OOM the 16 GB HBM.
        # NOTE: the formula floors at block=128, so the cap only holds up
        # to n ~ 4.2M; beyond that the slab grows linearly again (8.6 GB
        # at the 2^24 point limit) -- callers with larger clouds must
        # subsample or chunk columns.
        block = max(128, min(4096, (1 << 31) // (4 * max(n, 1)) // 128 * 128))
    pad = (-n) % block
    pts = jnp.pad(xyz, ((0, pad), (0, 0)),
                  constant_values=jnp.inf).astype(jnp.float32)
    sq = jnp.sum(jnp.nan_to_num(pts, posinf=0.0) ** 2, axis=1)
    valid = jnp.arange(n + pad) < n
    pts_z = jnp.where(valid[:, None], pts, 0.0)

    def body(carry, i):
        rows = jax.lax.dynamic_slice(pts_z, (i * block, 0), (block, 3))
        rows_sq = jnp.sum(rows ** 2, axis=1)
        # [block, N+pad] squared distances via MXU matmul
        d2 = (rows_sq[:, None] + sq[None, :]
              - 2.0 * jnp.matmul(rows, pts_z.T,
                                 precision=jax.lax.Precision.HIGHEST))
        row_valid = jax.lax.dynamic_slice(valid, (i * block,), (block,))
        d2 = jnp.where(valid[None, :], d2, jnp.inf)
        # mask self-distance
        col_ids = jnp.arange(n + pad)[None, :]
        row_ids = i * block + jnp.arange(block)[:, None]
        d2 = jnp.where(col_ids == row_ids, jnp.inf, d2)
        neg_topk = jax.lax.top_k(-d2, k)[0]
        mean_k = jnp.mean(-neg_topk, axis=1)
        return carry, jnp.where(row_valid, mean_k, 0.0)

    _, out = jax.lax.scan(body, None, jnp.arange((n + pad) // block))
    return out.reshape(-1)[:n]


def create_gaussians(init_xyz, init_color, sh_degree: int) -> GaussianParams:
    """Initialize gaussians from a seed point cloud.

    Matches reference semantics (litegs/scene/point.py:7-19): scale =
    log(sqrt(clamp(knn_dist, 1e-7))) replicated over 3 axes, identity quat,
    opacity = logit(0.1), sh_0 from RGB, sh_rest zero.

    Args:
      init_xyz:  [N, 3] float32
      init_color: [N, 3] float32 in [0, 1]
    """
    init_xyz = jnp.asarray(init_xyz, jnp.float32)
    init_color = jnp.asarray(init_color, jnp.float32)
    n = init_xyz.shape[0]
    dist2 = jnp.clip(knn_mean_sq_dist(init_xyz), 1e-7, None)
    scale = jnp.log(jnp.sqrt(dist2))[None].repeat(3, axis=0)
    rot = jnp.zeros((4, n), jnp.float32).at[0].set(1.0)
    sh_0 = sh_utils.rgb_to_sh0(init_color.T)[None]
    sh_rest = jnp.zeros((((sh_degree + 1) ** 2 - 1) * 3, n), jnp.float32)
    opacity = jnp.full((1, n), jnp.log(0.1 / 0.9), jnp.float32)
    return GaussianParams(xyz=init_xyz.T, scale=scale, rot=rot, sh_0=sh_0,
                          sh_rest=sh_rest, opacity=opacity)


def pad_params(params: GaussianParams, capacity: int) -> GaussianParams:
    """Pad every attribute to the static capacity.

    Padding points are parked far away with zero opacity-logit pushed to
    -inf-ish so that even if a padded chunk slips through culling it
    contributes nothing (the reference's dirty-tail zero-opacity fill,
    compact.cu:888-891, plays the same role).
    """
    n = params.capacity
    assert capacity >= n, (capacity, n)
    pad = capacity - n

    def pad_last(x, fill):
        widths = [(0, 0)] * (x.ndim - 1) + [(0, pad)]
        return jnp.pad(x, widths, constant_values=fill)

    return GaussianParams(
        xyz=pad_last(params.xyz, 1e8),
        scale=pad_last(params.scale, -15.0),
        rot=jnp.concatenate(
            [params.rot,
             jnp.zeros((4, pad), params.rot.dtype).at[0].set(1.0)], axis=-1),
        sh_0=pad_last(params.sh_0, 0.0),
        sh_rest=pad_last(params.sh_rest, 0.0),
        opacity=pad_last(params.opacity, -30.0),
    )


def pad_to_chunk(params: GaussianParams, chunk_size: int = 128
                 ) -> GaussianParams:
    """Pad the live prefix to a chunk multiple by repeating tail points
    (reference cluster.cluster_points, cluster.py:16-18)."""
    import jax
    n = params.capacity
    if n % chunk_size == 0:
        return params
    extra = chunk_size - n % chunk_size
    return jax.tree.map(
        lambda x: jnp.concatenate([x, x[..., -extra:]], axis=-1), params)


def activate(params: GaussianParams):
    """Raw params -> rendering quantities (exp / sigmoid / normalize).

    Matches reference render_preprocess's non-clustered branch
    (litegs/render/__init__.py:33-45).
    Returns (xyz [3,N], scale [3,N], rot_unit [4,N], opacity [N]).
    """
    scale = jnp.exp(params.scale)
    norm = jnp.sqrt(jnp.sum(params.rot ** 2, axis=0, keepdims=True))
    rot = params.rot / jnp.maximum(norm, 1e-12)
    opacity = jax.nn.sigmoid(params.opacity[0])
    return params.xyz, scale, rot, opacity
