"""Density control: score-based budgeted densification (TamingGS-style).

Functional, static-capacity redesign of the reference controllers
(litegs/training/densify.py).  The reference mutates optimizer state with
tensor surgery (cat / prune / replace, densify.py:36-98); here the whole
(params, adam, stats, active_count) bundle is transformed functionally at a
fixed capacity:

* appends write into the inactive tail (scatter at active_count + rank),
* prunes compact via a stable 3-way sort permutation
  (active-kept < pruned < inactive padding),
* multinomial-without-replacement sampling is Gumbel-top-k (exactly the
  same distribution as torch.multinomial(replacement=False),
  densify.py:308).

Semantics preserved from DensityControllerTamingGS:
* budget = min(max(ramp_target - N, 1) + prune_num, N)  (densify.py:304-305)
* score = var(fragment_err) * frag_count * sigmoid(op)^2 (:286-292)
* split if max(exp(scale)) > percent_dense * screen_extent else clone
  (:309-310); split scale divided by 1.6, offset ~ N(0, S) rotated (:313-325)
* prune: blend-weight sum == 0 ('weight' mode, :273-284) or opacity
  threshold + never-visible ('threshold' mode, :113-119)
* append/prune counts trimmed to chunk multiples (:148-154, :203-210)
* opacity 'decay': op *= 0.5 clamped >= 1/128, ALL Adam state cleared
  (:229-232); 'reset': op clamped <= 0.005, opacity moments cleared (:233-235)
"""
from __future__ import annotations

import dataclasses
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import DensifyParams
from ..ops import projection, scan
from ..scene.gaussians import GaussianParams
from ..scene.morton import spatial_sort_indices
from . import statistics
from .optimizer import AdamState


class DensifyState(NamedTuple):
    params: GaussianParams
    adam: AdamState
    active_count: jax.Array   # scalar int32


def densify_until_epoch(dp: DensifyParams, total_epochs: int) -> int:
    """Resolve densify_until < 0 (reference trainer.py:94-95)."""
    if dp.densify_until >= 0:
        return dp.densify_until
    return (int(total_epochs * 0.8 / dp.opacity_reset_interval)
            * dp.opacity_reset_interval + 1)


def _tree_where(mask_prim, new, old):
    """Select per-primitive (last axis) between two GaussianParams."""
    return jax.tree.map(
        lambda a, b: jnp.where(jnp.broadcast_to(mask_prim, b.shape), a, b),
        new, old)


def _tree_take(tree, perm):
    return jax.tree.map(lambda x: jnp.take(x, perm, axis=-1), tree)


def _tree_scatter(tree, dest_idx, src_tree, sel_mask):
    """tree[..., dest_idx[i]] = src_tree[..., i] where sel_mask[i]."""
    n = jax.tree.leaves(tree)[0].shape[-1]
    dest = jnp.where(sel_mask, dest_idx, n)  # out-of-range -> dropped

    def scat(t, s):
        t2 = jnp.moveaxis(t, -1, 0)
        s2 = jnp.moveaxis(s, -1, 0)
        return jnp.moveaxis(t2.at[dest].set(s2, mode="drop"), 0, -1)

    return jax.tree.map(scat, tree, src_tree)


def get_prune_mask(params: GaussianParams, stats: statistics.StatsState,
                   active_mask, dp: DensifyParams):
    """Reference get_prune_mask (densify.py:273-284 / 113-119)."""
    if dp.prune_mode == "weight":
        mask = stats.weight_sum == 0.0
    else:
        opacity = jax.nn.sigmoid(params.opacity[0])
        mask = opacity < dp.opacity_threshold
        mask |= stats.visible_count == 0
    return mask & active_mask


def get_score(params: GaussianParams, stats: statistics.StatsState,
              active_mask):
    """score = var(fragment_err) * count * sigmoid(op)^2 (densify.py:286-292)."""
    var = statistics.err_variance(stats)
    op = jax.nn.sigmoid(params.opacity[0])
    score = var * stats.frag_count * op * op
    score = jnp.clip(jnp.nan_to_num(score), 0.0, None)
    return jnp.where(active_mask, score, 0.0)


def taming_budget(prune_num, active_count, epoch: int, dp: DensifyParams,
                  densify_until: int, init_points_num: int,
                  chunk_size: int, capacity: int):
    """Append budget: linear ramp to target (+ prune slack), chunk-trimmed
    (reference densify.py:304-305)."""
    span = max(densify_until - dp.densify_from, 1)
    cur_target = ((dp.target_primitives - init_points_num) / span
                  * (epoch - dp.densify_from) + init_points_num)
    budget = jnp.minimum(
        jnp.maximum((cur_target - active_count).astype(jnp.int32), 1)
        + prune_num, active_count)
    # never grow past capacity (static guard; reference reallocates)
    budget = jnp.minimum(budget, capacity - active_count)
    return (budget // chunk_size) * chunk_size


def taming_sample_keys(score, key, capacity: int):
    """Gumbel top-k == multinomial without replacement (densify.py:308).

    Deterministic per primitive index for a given key -- the sharded layer
    generates the same [capacity] vector and slices its shard, so sharded
    selection is bit-identical to replicated."""
    gumbel = -jnp.log(-jnp.log(
        jax.random.uniform(key, (capacity,), minval=1e-10, maxval=1.0)))
    return jnp.where(score > 0, jnp.log(score) + gumbel, -jnp.inf)


def split_and_clone(params: GaussianParams, adam: AdamState,
                    stats: statistics.StatsState, active_count,
                    epoch: int, key, dp: DensifyParams,
                    densify_until: int, init_points_num: int,
                    screen_extent: float, chunk_size: int,
                    selected=None):
    """Budgeted densification step (reference densify.py:294-363).

    ``selected``: optional precomputed [capacity] selection mask (the
    sharded densification layer computes it from sharded stats +
    distributed top-k, litegs_tpu/parallel/densify.py, then reuses this
    append tail so replicated and sharded paths stay bit-identical).
    """
    n = params.capacity
    idx = jnp.arange(n)
    active_mask = idx < active_count

    if selected is not None:
        budget = jnp.sum(selected)
    elif dp.densify_mode == "official":
        # original-3DGS criterion: mean NDC positional-gradient norm over
        # the statistics window >= threshold (no primitive budget)
        mean_grad = statistics.mean_grad_norm(stats)
        want = (mean_grad >= dp.densify_grad_threshold) & active_mask
        budget = jnp.minimum(jnp.sum(want), n - active_count)
        budget = (budget // chunk_size) * chunk_size
        rank_of = scan.cumsum(want.astype(jnp.int32)) - 1
        selected = want & (rank_of < budget)
    else:
        prune_num = jnp.sum(get_prune_mask(params, stats, active_mask, dp))
        budget = taming_budget(prune_num, active_count, epoch, dp,
                               densify_until, init_points_num, chunk_size, n)
        score = get_score(params, stats, active_mask)
        sample_key = taming_sample_keys(score, key, n)
        order = jnp.argsort(-sample_key)
        rank_of = jnp.zeros(n, jnp.int32).at[order].set(
            jnp.arange(n, dtype=jnp.int32))
        selected = (rank_of < budget) & (score > 0)

    # split vs clone by world extent (densify.py:309-310)
    max_scale = jnp.max(jnp.exp(params.scale), axis=0)
    is_split = selected & (max_scale > dp.percent_dense * screen_extent)

    # new primitives: clones copy; splits offset by R @ (s * eps) and
    # shrink scale by 1.6 (densify.py:313-325)
    key2 = jax.random.fold_in(key, 1)
    eps = jax.random.normal(key2, (3, n)) * jnp.exp(params.scale)
    norm = jnp.sqrt(jnp.sum(params.rot ** 2, axis=0, keepdims=True))
    rot_unit = params.rot / jnp.maximum(norm, 1e-12)
    rot_m = projection.create_transform_matrix(jnp.ones((3, n)), rot_unit)
    # row-vector convention: shift = eps_row @ M  (densify.py:318)
    shift = jnp.einsum("in,ijn->jn", eps, rot_m,
                       precision=jax.lax.Precision.HIGHEST)
    new_xyz = jnp.where(is_split, params.xyz + shift, params.xyz)
    new_scale = jnp.where(is_split,
                          params.scale - jnp.log(1.6), params.scale)
    new_params = params._replace(xyz=new_xyz, scale=new_scale)

    # scatter appends to the tail; fresh primitives get zero Adam moments
    rank_sel = scan.cumsum(selected.astype(jnp.int32)) - 1
    dest = (active_count + rank_sel).astype(jnp.int32)
    params_out = _tree_scatter(params, dest, new_params, selected)
    zeros = jax.tree.map(jnp.zeros_like, params)
    adam_out = AdamState(
        exp_avg=_tree_scatter(adam.exp_avg, dest, zeros, selected),
        exp_avg_sq=_tree_scatter(adam.exp_avg_sq, dest, zeros, selected))
    # budget is chunk-trimmed, but fewer than `budget` primitives can carry
    # a positive score -- floor again so active_count stays a chunk
    # multiple (a partial chunk would be masked out of the AABB pass and
    # silently never render); over-scattered entries past the floored
    # count land in the inactive tail, which is harmless
    appended = (jnp.minimum(jnp.sum(selected), budget)
                // chunk_size) * chunk_size
    return params_out, adam_out, active_count + appended


def prune(params: GaussianParams, adam: AdamState,
          stats: statistics.StatsState, active_count, dp: DensifyParams,
          chunk_size: int, stats_valid_count=None, prune_mask=None):
    """Compact pruned primitives out via a stable permutation
    (reference densify.py:138-157 + _prune_optimizer :72-98).

    stats_valid_count: primitives appended after the statistics were
    collected must not be pruned by zero-weight (the reference's prune mask
    only ORs `invisible` over the pre-append prefix, densify.py:278-280).
    prune_mask: optional precomputed [capacity] mask (sharded path).
    """
    n = params.capacity
    idx = jnp.arange(n)
    active_mask = idx < active_count
    if stats_valid_count is not None:
        active_mask &= idx < stats_valid_count
    if prune_mask is None:
        prune_mask = get_prune_mask(params, stats, active_mask, dp)
    else:
        prune_mask = prune_mask & active_mask
    # sanity abort: a run about to prune >80% of its primitives is broken
    # (diverged opacities / dead stats); the reference hard-asserts here
    # (densify.py:146-147).  Host-level check -- densify runs at epoch
    # boundaries where a readback is already paid.
    n_prune = int(jnp.sum(prune_mask))
    n_active = max(int(active_count), 1)
    if n_prune > 0.8 * n_active:
        raise RuntimeError(
            f"densify prune would remove {n_prune}/{n_active} (>80%) of "
            "primitives -- aborting (reference densify.py:146-147)")
    # trim to chunk multiple: only the first del_limit pruned primitives
    # are removed (densify.py:148-154)
    prune_rank = scan.cumsum(prune_mask.astype(jnp.int32)) - 1
    del_limit = (jnp.sum(prune_mask) // chunk_size) * chunk_size
    prune_eff = prune_mask & (prune_rank < del_limit)
    # stable 3-way partition: kept-active < pruned < inactive
    bucket = jnp.where(active_mask, jnp.where(prune_eff, 1, 0), 2)
    _, perm = jax.lax.sort_key_val(bucket.astype(jnp.int32),
                                   jnp.arange(n, dtype=jnp.int32),
                                   is_stable=True)
    params_out = _tree_take(params, perm)
    adam_out = AdamState(exp_avg=_tree_take(adam.exp_avg, perm),
                         exp_avg_sq=_tree_take(adam.exp_avg_sq, perm))
    return params_out, adam_out, active_count - del_limit


def reset_opacity(params: GaussianParams, adam: AdamState,
                  dp: DensifyParams):
    """Opacity decay/reset (reference densify.py:224-237)."""
    op = jax.nn.sigmoid(params.opacity)
    if dp.opacity_reset_mode == "decay":
        new_op = jnp.clip(op * 0.5, 1.0 / 128, None)
        new_logit = jnp.log(new_op / (1 - new_op))
        params_out = params._replace(opacity=new_logit)
        adam_out = AdamState(
            exp_avg=jax.tree.map(jnp.zeros_like, adam.exp_avg),
            exp_avg_sq=jax.tree.map(jnp.zeros_like, adam.exp_avg_sq))
    else:
        new_op = jnp.clip(op, None, 0.005)
        new_logit = jnp.log(new_op / (1 - new_op))
        params_out = params._replace(opacity=new_logit)
        adam_out = AdamState(
            exp_avg=adam.exp_avg._replace(
                opacity=jnp.zeros_like(adam.exp_avg.opacity)),
            exp_avg_sq=adam.exp_avg_sq._replace(
                opacity=jnp.zeros_like(adam.exp_avg_sq.opacity)))
    return params_out, adam_out


def spatial_refine(params: GaussianParams, adam: AdamState, active_count):
    """Morton resort of primitives + optimizer state
    (reference scene/point.py:86-154, invoked trainer.py:104-106)."""
    n = params.capacity
    active_mask = jnp.arange(n) < active_count
    perm = spatial_sort_indices(params.xyz, active_mask)
    params_out = _tree_take(params, perm)
    adam_out = AdamState(exp_avg=_tree_take(adam.exp_avg, perm),
                         exp_avg_sq=_tree_take(adam.exp_avg_sq, perm))
    return params_out, adam_out


def densify_step(params, adam, stats, active_count, epoch: int, key,
                 dp: DensifyParams, densify_until: int,
                 init_points_num: int, screen_extent: float,
                 chunk_size: int):
    """Whole per-epoch density-control step (reference densify.py:246-260).

    Python-level branching on epoch (static at trace time per epoch kind);
    returns (params, adam, active_count, did_update).
    """
    did = False
    if dp.densify_from <= epoch < densify_until:
        if epoch % dp.densification_interval == 0:
            pre_append_count = active_count
            params, adam, active_count = split_and_clone(
                params, adam, stats, active_count, epoch, key, dp,
                densify_until, init_points_num, screen_extent, chunk_size)
            params, adam, active_count = prune(
                params, adam, stats, active_count, dp, chunk_size,
                stats_valid_count=pre_append_count)
            did = True
        if epoch % dp.opacity_reset_interval == 0:
            params, adam = reset_opacity(params, adam, dp)
            did = True
    return params, adam, active_count, did
