"""Sharded densification: stats + selection distributed over the
primitive axis.

The reference's density control is single-GPU optimizer-state surgery
(litegs/training/densify.py:36-98 cat/prune, :294-363 TamingGS selection).
At mesh scale the *per-primitive statistics* (7 accumulators of [capacity])
and the *selection compute* dominate densification state and work, so those
shard over the ``data`` axis; the parameters stay replicated (the data-
parallel design of litegs_tpu.parallel), so the append/permute tail runs
identically on every device from two allgathered [capacity] bit masks.

Layout per device (D devices, capacity N):
  * stats shards      [N/D] slices of every StatsState accumulator
    (written by the train step via psum_scatter instead of psum -- D x less
    stats memory + traffic per step),
  * selection compute [N/D]: score, gumbel keys, bisection counts,
  * allgathered       selection/prune masks (N bits each) + scalars.

Both controller modes are supported: taming (budgeted Gumbel-top-k) and
official (grad-threshold, original-3DGS) -- each proven bit-identical to
its replicated counterpart (tests/test_parallel_densify.py).

The distributed top-k is *exact and deterministic*: keys are bisected in
their monotone uint32 bit image (32 psum'd count rounds, one scalar psum
each -- no key allgather), with ties broken by lowest global index --
bit-identical to the replicated ``argsort(-key)`` stable selection
(training/densify.py taming path).  The same PRNG vector is generated from
the shared key and sliced per shard, so sharded == replicated holds
bitwise end-to-end (tests/test_parallel_densify.py).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..config import DensifyParams
from ..scene.gaussians import GaussianParams
from ..training import densify as dens
from ..training import statistics

DATA_AXIS = "data"


def order_key_u32(x):
    """Monotone bijection f32 -> uint32 (IEEE-754 total-order trick):
    positives get the sign bit set, negatives are bit-complemented, so
    uint32 comparison == float comparison (-inf lowest)."""
    u = jax.lax.bitcast_convert_type(x, jnp.uint32)
    neg = u >= jnp.uint32(0x80000000)
    return jnp.where(neg, ~u, u | jnp.uint32(0x80000000))


def sharded_topk_mask(local_keys, budget, axis_name=DATA_AXIS):
    """Exact distributed top-``budget`` selection over sharded f32 keys.

    Args:
      local_keys: [n_local] f32 shard of the global key vector
                  (-inf = ineligible).
      budget:     scalar int32 (dynamic), number of keys to select.
    Returns:
      [n_local] bool mask; globally exactly min(budget, #finite keys) are
      set, identical to stable ``argsort(-keys)[:budget]`` of the gathered
      keys (ties resolved by lowest global index).

    32-round bisection for tau = budget-th largest key: each round is one
    [n_local] comparison + a scalar psum; communication is O(log) scalars,
    never the keys themselves.
    """
    kord = order_key_u32(local_keys)

    def round_(carry, _):
        lo, hi = carry
        mid = lo + (hi - lo) // jnp.uint32(2)
        cnt = jax.lax.psum(jnp.sum(kord > mid, dtype=jnp.int32), axis_name)
        # searching min v with count(keys > v) < budget
        below = cnt < budget
        return (jnp.where(below, lo, mid + jnp.uint32(1)),
                jnp.where(below, mid, hi)), None

    init = (jnp.uint32(0), jnp.uint32(0xFFFFFFFF))
    (tau, _), _ = jax.lax.scan(round_, init, None, length=32)
    above = kord > tau
    n_above = jax.lax.psum(jnp.sum(above, dtype=jnp.int32), axis_name)
    need = jnp.maximum(budget - n_above, 0)
    at = kord == tau
    # deterministic tie-break: global rank by index = exclusive psum-prefix
    # over shards + local exclusive cumsum
    axis_idx = jax.lax.axis_index(axis_name)
    n_dev = jax.lax.axis_size(axis_name)
    per_shard = jax.lax.all_gather(jnp.sum(at, dtype=jnp.int32), axis_name)
    prefix = jnp.sum(jnp.where(jnp.arange(n_dev) < axis_idx, per_shard, 0))
    tie_rank = prefix + jnp.cumsum(at.astype(jnp.int32)) - 1
    finite = local_keys > -jnp.inf
    return (above | (at & (tie_rank < need))) & finite


def init_sharded_stats(mesh: Mesh, capacity: int) -> statistics.StatsState:
    """Stats accumulators laid out sharded over the primitive axis."""
    stats = statistics.init_stats(capacity)
    sharding = NamedSharding(mesh, P(DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stats)


def scatter_stats_update(stats_local, delta_full, axis_name=DATA_AXIS):
    """Accumulate a full-axis [capacity] stats delta into the local shard:
    psum_scatter replaces the replicated psum (D x less traffic + memory).

    Call inside shard_map with ``stats_local`` sharded P(data) and
    ``delta_full`` a per-device [capacity] contribution.
    """
    def rs(acc, d):
        return acc + jax.lax.psum_scatter(
            d.astype(acc.dtype), axis_name, scatter_dimension=0, tiled=True)

    return jax.tree.map(rs, stats_local, delta_full)


@functools.lru_cache(maxsize=8)
def _make_select_fn(mesh: Mesh, dp: DensifyParams, densify_until: int,
                    init_points_num: int, chunk_size: int, capacity: int):
    """Jitted shard_map pass: sharded stats -> replicated
    (selected, prune) [capacity] masks."""

    def shard_fn(params: GaussianParams, stats, active_count, epoch, key):
        n_local = stats.weight_sum.shape[0]
        axis_idx = jax.lax.axis_index(DATA_AXIS)
        lo = axis_idx * n_local
        idx_local = lo + jnp.arange(n_local)
        active_local = idx_local < active_count

        def sl(x):
            return jax.lax.dynamic_slice_in_dim(x, lo, n_local, axis=-1)

        params_local = jax.tree.map(sl, params)

        prune_local = dens.get_prune_mask(params_local, stats,
                                          active_local, dp)
        if dp.densify_mode == "official":
            # original-3DGS criterion (training/densify.py:149-157): mean
            # NDC grad norm >= threshold, selected in INDEX order up to the
            # chunk-trimmed capacity headroom.  Global rank = psum'd shard
            # prefix + local cumsum, bit-identical to the replicated
            # cumsum-based rank.
            mean_grad = statistics.mean_grad_norm(stats)
            want_local = ((mean_grad >= dp.densify_grad_threshold)
                          & active_local)
            n_want_local = jnp.sum(want_local, dtype=jnp.int32)
            total_want = jax.lax.psum(n_want_local, DATA_AXIS)
            budget = jnp.minimum(total_want, capacity - active_count)
            budget = (budget // chunk_size) * chunk_size
            axis_idx = jax.lax.axis_index(DATA_AXIS)
            n_dev = jax.lax.axis_size(DATA_AXIS)
            per_shard = jax.lax.all_gather(n_want_local, DATA_AXIS)
            prefix = jnp.sum(jnp.where(jnp.arange(n_dev) < axis_idx,
                                       per_shard, 0))
            rank_local = prefix + jnp.cumsum(
                want_local.astype(jnp.int32)) - 1
            sel_local = want_local & (rank_local < budget)
        else:
            prune_num = jax.lax.psum(jnp.sum(prune_local, dtype=jnp.int32),
                                     DATA_AXIS)
            budget = dens.taming_budget(prune_num, active_count, epoch, dp,
                                        densify_until, init_points_num,
                                        chunk_size, capacity)
            score_local = dens.get_score(params_local, stats, active_local)
            # identical [capacity] gumbel vector as the replicated path
            # (taming_sample_keys with score == 1 is the pure gumbel),
            # sliced
            gumbel_local = sl(dens.taming_sample_keys(
                jnp.ones((capacity,)), key, capacity))
            key_local = jnp.where(score_local > 0,
                                  jnp.log(score_local) + gumbel_local,
                                  -jnp.inf)
            sel_local = sharded_topk_mask(key_local, budget)
        selected = jax.lax.all_gather(sel_local, DATA_AXIS, tiled=True)
        prune_full = jax.lax.all_gather(prune_local, DATA_AXIS, tiled=True)
        return selected, prune_full

    rep = P()
    stats_spec = statistics.StatsState(*([P(DATA_AXIS)] * 7))
    mapped = jax.shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rep, stats_spec, rep, rep, rep),
        out_specs=(rep, rep),
        check_vma=False)
    return jax.jit(mapped)


def sharded_densify_step(mesh, params, adam, stats_shards, active_count,
                         epoch: int, key, dp: DensifyParams,
                         densify_until: int, init_points_num: int,
                         screen_extent: float, chunk_size: int):
    """Full sharded density-control step on the reference schedule
    (densify.py:246-260): sharded stats/selection + replicated
    append/prune tail with the masks injected.

    Returns (params, adam, active_count, did) exactly like
    training.densify.densify_step and bit-identical to it for the same
    key (tests/test_parallel_densify.py).
    """
    did = False
    capacity = params.capacity
    if dp.densify_from <= epoch < densify_until:
        if epoch % dp.densification_interval == 0:
            select_fn = _make_select_fn(mesh, dp, densify_until,
                                        init_points_num, chunk_size,
                                        capacity)
            selected, prune_mask = select_fn(
                params, stats_shards, active_count, jnp.int32(epoch), key)
            pre_append = active_count
            # replicated stats argument is unused once masks are injected
            dummy = statistics.init_stats(capacity)
            params, adam, active_count = dens.split_and_clone(
                params, adam, dummy, active_count, epoch, key, dp,
                densify_until, init_points_num, screen_extent, chunk_size,
                selected=selected)
            params, adam, active_count = dens.prune(
                params, adam, dummy, active_count, dp, chunk_size,
                stats_valid_count=pre_append, prune_mask=prune_mask)
            did = True
        if epoch % dp.opacity_reset_interval == 0:
            params, adam = dens.reset_opacity(params, adam, dp)
            did = True
    return params, adam, active_count, did
