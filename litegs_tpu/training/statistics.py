"""Per-primitive training statistics feeding densification.

Functional pytree replacement for the reference's mutable singleton
StatisticsHelper (litegs/utils/statistic_helper.py).  Accumulates, per
primitive, over the iterations of a statistics epoch:

* visible_count   -- #iterations the primitive touched >= 1 tile
  (statistic_helper.py:82-93; used by the 'threshold' prune mode)
* fragment_weight -- sum / square-sum / count of per-iteration blend-weight
  sums (statistic_helper.py:97-156 with raster.cu:289-301 producers; the
  'weight' prune mode tests sum == 0)
* fragment_err    -- sum / square-sum / count of per-iteration opacity
  gradients (producers raster.cu:779-820 + wrapper.py:496-500; densify
  score uses var * count * sigmoid(opacity)^2)

Scatter from the compacted visible arrays back to the full primitive axis
is a segment-style index add (the reference uses a dedicated
gpu_driven_pipeline_sparse_op kernel, compact.cu:1215-1335).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class StatsState(NamedTuple):
    visible_count: jax.Array   # [N] int32
    weight_sum: jax.Array      # [N]
    weight_sq_sum: jax.Array   # [N]
    err_sum: jax.Array         # [N]
    err_sq_sum: jax.Array      # [N]
    frag_count: jax.Array      # [N]
    grad_norm_sum: jax.Array   # [N] accumulated ||d mean2d||_ndc (the
    #                            original-3DGS densify signal; feeds the
    #                            'official' controller mode)


def init_stats(capacity: int) -> StatsState:
    def z():
        # distinct buffers: donated arguments must not alias
        return jnp.zeros((capacity,), jnp.float32)

    return StatsState(visible_count=jnp.zeros((capacity,), jnp.int32),
                      weight_sum=z(), weight_sq_sum=z(), err_sum=z(),
                      err_sq_sum=z(), frag_count=z(), grad_norm_sum=z())


def global_indices(chunk_ids, chunk_size: int):
    """Visible-compacted slot -> global primitive index."""
    m = chunk_ids.shape[0] * chunk_size
    slot = jnp.arange(m)
    return jnp.take(chunk_ids, slot // chunk_size) * chunk_size + (
        slot % chunk_size)


def update_stats(stats: StatsState, chunk_ids, valid_mask,
                 primitive_visible, raster_stats,
                 chunk_size: int) -> StatsState:
    """Accumulate one iteration's statistics.

    The compacted -> global scatter is done at CHUNK granularity as an
    inverse-map GATHER (the visible->global map is chunk-affine with
    unique chunk ids), not a per-primitive scatter-add: 7 scatter-adds at
    1M indices measure ~48 ms on-chip while this form moves the same
    bytes with ~8k chunk indices (scripts/microbench_r3.py
    stats_scatter_*; the reference's dedicated sparse_scatter_kernel,
    compact.cu:1215-1335, is the CUDA shape of the same idea).

    Args:
      chunk_ids: [Mv/chunk] visible chunk ids (unique; tail arbitrary).
      valid_mask: [Mv] bool (False past the visible prefix).
      primitive_visible: [Mv] bool from binning.
      raster_stats: ops.raster.RasterStats over the compacted axis.
    """
    n = stats.weight_sum.shape[0]
    nchunks = n // chunk_size
    cap = chunk_ids.shape[0]
    chunk_valid = valid_mask[::chunk_size]                      # [cap]
    pos = jnp.where(chunk_valid, chunk_ids, nchunks)
    # global chunk -> compacted rank; cap (-> zero pad row) if invisible
    inv = jnp.full((nchunks,), cap, jnp.int32).at[pos].set(
        jnp.arange(cap, dtype=jnp.int32), mode="drop",
        unique_indices=True)

    def add(acc, val):
        vc = val.astype(acc.dtype).reshape(cap, chunk_size)
        vc = jnp.pad(vc, ((0, 1), (0, 0)))                      # zero row
        return acc + jnp.take(vc, inv, axis=0).reshape(-1)

    return StatsState(
        visible_count=add(stats.visible_count,
                          primitive_visible & valid_mask),
        weight_sum=add(stats.weight_sum, raster_stats.weight_sum),
        weight_sq_sum=add(stats.weight_sq_sum,
                          raster_stats.weight_sum ** 2),
        err_sum=add(stats.err_sum, raster_stats.err_sum),
        err_sq_sum=add(stats.err_sq_sum, raster_stats.err_square_sum),
        frag_count=add(stats.frag_count, raster_stats.frag_count),
        grad_norm_sum=add(stats.grad_norm_sum, raster_stats.grad_norm),
    )


def err_variance(stats: StatsState):
    """var(fragment_err) per primitive (statistic_helper.py:225-240):
    E[x^2] - E[x]^2 with the reference's count+1 denominator, clamped >= 0.
    """
    denom = stats.frag_count + 1.0
    mean = stats.err_sum / denom
    mean_sq = stats.err_sq_sum / denom
    return jnp.clip(jnp.nan_to_num(mean_sq - mean * mean), 0.0, None)


def permute(stats: StatsState, perm) -> StatsState:
    return StatsState(*[jnp.take(x, perm) for x in stats])


def mean_grad_norm(stats: StatsState):
    """Mean per-iteration NDC positional-gradient norm (the original-3DGS
    densify criterion: accumulated norms / times visible)."""
    return stats.grad_norm_sum / jnp.maximum(
        stats.visible_count.astype(jnp.float32), 1.0)
