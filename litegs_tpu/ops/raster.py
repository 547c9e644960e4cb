"""Differentiable rasterize op: unified front-end over the Pallas TPU
kernels and the pure-jnp reference path.

The Pallas backend wires the hand-written backward kernel in via
``jax.custom_vjp``; per-entry gradients are reduced to per-point gradients
by :func:`reduce_entries_to_points` -- one id-sort, ONE [E, K] row-gather
into point-sorted order, and a chunked-cumsum boundary difference (the
TPU replacement for the reference's atomicAdd accumulation into
PackedGrad, raster.cu:794-849; measured 1.5x faster than K independent
1-D segment_sums, scripts/microbench_reduce2.py).

Statistics (per-point fragment weight/count and opacity-gradient moments
feeding densification, reference raster.cu:289-301,779-820 +
wrapper.py:496-500) are NOT a hidden side effect of backward here -- JAX is
functional -- but an explicit ``raster_stats`` pass the trainer runs on
statistics epochs with the loss's image cotangent.  The expensive
per-entry packing is shared: ``rasterize`` returns a cache the trainer
threads back into ``raster_stats``.
"""
from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from . import raster_jnp, raster_pallas, scan
from .binning import BinningResult


class RasterStats(NamedTuple):
    weight_sum: jax.Array   # [M] sum of blend weights (fwd stat)
    frag_count: jax.Array   # [M] fragments with valid alpha
    err_sum: jax.Array      # [M] sum of per-fragment d_opacity
    err_square_sum: jax.Array  # [M] sum of squared per-fragment d_opacity
    grad_norm: jax.Array    # [M] ||d mean2d||_ndc this iteration (the
    #                         original-3DGS densify signal; the reference's
    #                         Official controller reads a 'mean2d_grad'
    #                         statistic that nothing produces --
    #                         densify.py:123 -- so the semantics here follow
    #                         Inria 3DGS: per-iteration NDC-grad norms
    #                         averaged over visible iterations)


class RasterCache(NamedTuple):
    """Non-differentiable per-entry state shared by fwd / bwd / stats."""

    packed: raster_pallas.PackedEntries
    block_tile: jax.Array
    block_cnt: jax.Array


def reduce_entries_to_points(cols, table: BinningResult, m: int):
    """Per-entry value columns (list of [E]) -> per-point sums [K, M].

    The TPU replacement for the reference's atomicAdd gradient
    accumulation (raster.cu:794-849).  K independent 1-D segment_sums
    lower to one id-sort plus K random per-column permute+reduce fusions
    (~20 ms each at bench scale); doing the permute ONCE as a [E, K]
    row-gather and reducing the then-contiguous per-point runs with a
    chunked-cumsum boundary difference measures 1.5x faster end to end
    (118 ms vs 181 ms at E=2.9M, K=10 -- scripts/microbench_reduce2.py).
    Two layout rules keep it at that speed (HLO trace, PERF.md):
    * the [E, K] interleave is materialized BEHIND a fence before the
      gather -- fused with its transpose producer, the gather reads K
      strided columns per index (40 ms vs 17 ms);
    * point p's run start in id-sorted order IS ends[p-1] (ends is a
      cumsum), so the low boundary is a shift of the high gather, not a
      second M-scale gather (each costs ~30 ms).

    Columns at invalid table slots MUST already be zeroed (their ids sort
    to the trailing segment m and the boundary arithmetic then never
    reads them; on overflow entry_valid is all-False, everything is zero,
    and the result is exactly zero -- the trainer discards the step
    anyway).
    """
    k = len(cols)
    e = cols[0].shape[0]
    ids = jnp.where(table.entry_valid, table.sorted_point, m)
    _, perm = jax.lax.sort_key_val(ids, jnp.arange(e, dtype=jnp.int32))
    ends = jnp.minimum(scan.cumsum(table.point_counts), e)

    def group(gcols):
        kk = len(gcols)
        rs_src = jax.lax.optimization_barrier(jnp.stack(gcols, axis=1))
        rs = jnp.take(rs_src, perm, axis=0)          # [E, kk] row-gather
        cum = scan.cumsum2d(rs)                      # [E, kk]
        cum = jnp.concatenate([jnp.zeros((1, kk), cum.dtype), cum], axis=0)
        hi = jnp.take(cum, ends, axis=0)             # [M, kk]
        lo = jnp.concatenate([jnp.zeros((1, kk), hi.dtype), hi[:-1]],
                             axis=0)
        return hi - lo

    # Group columns into the fewest pipelines of width <= 8: measured on
    # chip at E=2.7M (scripts/microbench_r3.py), any single group of
    # width 1..8 costs a flat ~21-23 ms (the per-index permute dominates;
    # a [E, k<=8] row is one 32-byte-class access), while width 9+ jumps
    # to ~68 ms -- so k=6..8 must NOT split (ADVICE r2: the old half-split
    # rule cost 42 ms at k=6 vs 23.5 unsplit) and k=9..16 splits into two
    # balanced groups (42-44 ms).  Column arithmetic is independent per
    # column, so grouping is bit-exact.
    ngroups = -(-k // 8)
    if ngroups > 1:
        base, rem = divmod(k, ngroups)
        widths = [base + (i < rem) for i in range(ngroups)]
        outs, at = [], 0
        for w in widths:
            outs.append(group(cols[at:at + w]))
            at += w
        out = jnp.concatenate(outs, axis=1)
    else:
        out = group(cols)
    return out.T


def build_cache(mean_pix, inv_cov, color4, opacity, table: BinningResult,
                tiles_total: int, tiles_x: int, tile_h: int,
                tile_w: int, has_depth: bool = True,
                tiles_y: int = 0) -> RasterCache:
    sg = jax.lax.stop_gradient
    # skip gathering the depth row when it is a zero pad (gathers are the
    # dominant cost of packing)
    depth = sg(color4[3]) if has_depth else None
    packed = raster_pallas.pack_entry_params(
        sg(mean_pix), sg(inv_cov), sg(color4[:3]), sg(opacity),
        depth, table.sorted_point, table.sorted_tile,
        table.entry_valid, tiles_x, tile_h, tile_w, tiles_y=tiles_y)
    bt, bc = raster_pallas.block_tables(table, tiles_total)
    return RasterCache(packed=packed, block_tile=bt, block_cnt=bc)


def zero_stats_sink(m: int) -> RasterStats:
    """A zero RasterStats pytree to use as the gradient-sink input of
    :func:`rasterize` (see ``stats_sink`` there)."""
    z = jnp.zeros((m,), jnp.float32)
    return RasterStats(weight_sum=z, frag_count=z, err_sum=z,
                       err_square_sum=z, grad_norm=z)


def rasterize(mean_pix, inv_cov, color, opacity, table: BinningResult,
              tiles_total: int, tiles_x: int, tile_h: int, tile_w: int,
              backend: str = "pallas", interpret: bool = False,
              stats_sink: Optional[RasterStats] = None,
              img_h: int = 0, img_w: int = 0, tiles_y: int = 0):
    """Rasterize gaussians into tile-layout images (differentiable).

    Args:
      mean_pix: [2, M] pixel-space means (differentiable).
      inv_cov:  [3, M] inverse 2D covariance (a, b, c) (differentiable).
      color:    [C, M], C in {3, 4} (rgb [+ depth]) (differentiable).
      opacity:  [M] activated opacities (differentiable).
      table:    binning result (non-differentiable).
      stats_sink: optional zero RasterStats pytree (``zero_stats_sink(M)``).
        When given (pallas backend), the custom VJP emits the
        densification statistics as the *cotangent of the sink*: the
        caller differentiates the loss w.r.t. the sink and receives
        RasterStats computed from the SAME backward-kernel run and the
        SAME per-point reduce as the parameter gradients -- the TPU
        equivalent of the reference accumulating stats inside the real
        backward pass (raster.cu:289-301,779-820; wrapper.py:496-500)
        without re-running the kernel the way a separate ``raster_stats``
        pass must.
      img_h/img_w: true image dims for the NDC grad_norm scale (stats
        path only; defaults to the tile-grid extent).
    Returns:
      (tiles_color [T, C, P], tiles_trans [T, P], cache or None)
    """
    nchan, m = color.shape
    if backend == "jnp":
        out = raster_jnp.rasterize_reference(
            mean_pix, inv_cov, color, opacity, table.sorted_point,
            table.sorted_tile, table.entry_valid, table.tile_start,
            tiles_total, tiles_x, tile_h, tile_w)
        return out.tiles_color, out.tiles_trans, None

    has_depth = nchan == 4
    want_stats = stats_sink is not None
    color4 = color if nchan == 4 else jnp.pad(color, ((0, 4 - nchan), (0, 0)))
    cache = build_cache(mean_pix, inv_cov, color4, opacity, table,
                        tiles_total, tiles_x, tile_h, tile_w,
                        has_depth=has_depth, tiles_y=tiles_y)

    def _raster_fwd(mean_pix, inv_cov, color4, opacity, *sink):
        out_raw = raster_pallas.raster_forward_pallas(
            cache.packed.params, cache.block_tile, cache.block_cnt,
            tiles_total, tile_h, tile_w, interpret=interpret,
            has_depth=has_depth)
        # rows of never-visited (empty) tiles are uninitialized: zero the
        # channels and set transmittance to 1 there
        empty = table.tile_count <= 0
        out_tiles = jnp.where(empty[:, None, None], 0.0,
                              out_raw[:tiles_total])
        out_tiles = out_tiles.at[:, 4, :].add(
            jnp.where(empty, 1.0, 0.0)[:, None])
        return out_tiles, out_tiles

    def _raster_bwd(out_tiles, d_out):
        """Shared VJP core: one backward-kernel run, ONE combined per-point
        reduce covering the parameter gradients and (when requested) the
        fragment statistics columns."""
        d_color_t = d_out[:, 0:4, :]
        d_trans_t = d_out[:, 4, :]
        grads16 = _backward_entry_grads(
            cache, out_tiles, d_color_t, d_trans_t,
            tiles_total, tile_h, tile_w, interpret,
            has_depth=has_depth, with_stats=want_stats)
        e = table.sorted_point.shape[0]
        g16 = jnp.where(table.entry_valid[None, :], grads16[:, :e], 0.0)
        params = cache.packed.params
        op_e = jnp.maximum(params[15, :e], 1e-12)
        conv = raster_pallas.moments_to_grads(
            g16, cache.packed.mu_local, params[12:15, :e], op_e)
        nch = 4 if has_depth else 3  # drop the known-zero depth column
        cols = ([conv["d_color"][c] for c in range(nch)]
                + [conv["d_invcov"][c] for c in range(3)]
                + [conv["d_mean"][c] for c in range(2)]
                + [conv["d_opacity"]])                       # 9-10 x [E]
        if want_stats:
            cols += [g16[11], g16[12], g16[13] / (op_e * op_e)]
        red = reduce_entries_to_points(cols, table, m)
        d_color4 = red[0:4] if has_depth else jnp.concatenate(
            [red[0:3], jnp.zeros((1, m), red.dtype)], axis=0)
        d_invcov = red[nch:nch + 3]
        d_mean = red[nch + 3:nch + 5]
        d_op = red[nch + 5]
        if not want_stats:
            return d_mean, d_invcov, d_color4, d_op
        # stats columns: err_sum IS the reduced d_opacity (both are
        # sum(dpw)/op per entry); grad_norm is the NDC-scaled norm of the
        # reduced positional gradient -- identical to raster_stats
        sx = 0.5 * (img_w if img_w else tiles_x * tile_w)
        sy = 0.5 * (img_h if img_h else (tiles_total // tiles_x) * tile_h)
        gn = jnp.sqrt((d_mean[0] * sx) ** 2 + (d_mean[1] * sy) ** 2)
        stats = RasterStats(weight_sum=red[nch + 6],
                            frag_count=red[nch + 7],
                            err_sum=d_op,
                            err_square_sum=red[nch + 8],
                            grad_norm=gn)
        return d_mean, d_invcov, d_color4, d_op, stats

    if want_stats:
        @jax.custom_vjp
        def _raster(mean_pix, inv_cov, color4, opacity, sink):
            return _raster_fwd(mean_pix, inv_cov, color4, opacity)[0]

        def _fwd5(mp, ic, c4, op_, sink):
            return _raster_fwd(mp, ic, c4, op_)

        _raster.defvjp(_fwd5, _raster_bwd)
        out_tiles = _raster(mean_pix, inv_cov, color4, opacity, stats_sink)
    else:
        @jax.custom_vjp
        def _raster(mean_pix, inv_cov, color4, opacity):
            return _raster_fwd(mean_pix, inv_cov, color4, opacity)[0]

        _raster.defvjp(_raster_fwd, _raster_bwd)
        out_tiles = _raster(mean_pix, inv_cov, color4, opacity)
    return out_tiles[:, 0:nchan, :], out_tiles[:, 4, :], cache


def _backward_entry_grads(cache: RasterCache, out_tiles, d_color_t,
                          d_trans_t, tiles_total, tile_h, tile_w,
                          interpret, has_depth: bool = True,
                          with_stats: bool = True):
    """Assemble the backward kernel input tiles and run it."""
    acc = out_tiles[:, 0:4, :]
    t_fin = out_tiles[:, 4, :]
    d0 = (jnp.sum(d_color_t * acc, axis=1) + t_fin * d_trans_t)  # [T, P]
    dtiles = jnp.concatenate([
        d_color_t, d_trans_t[:, None, :], d0[:, None, :],
        jnp.zeros_like(d0[:, None, :]).repeat(2, axis=1)], axis=1)
    dtiles = jnp.pad(dtiles, ((0, 1), (0, 0), (0, 0)))  # padding-block row
    return raster_pallas.raster_backward_pallas(
        cache.packed.params, dtiles, cache.block_tile, cache.block_cnt,
        tiles_total, tile_h, tile_w, interpret=interpret,
        has_depth=has_depth, with_stats=with_stats)


def raster_stats(mean_pix, inv_cov, color, opacity, table: BinningResult,
                 out_tiles_color, out_tiles_trans, d_tiles_color,
                 d_tiles_trans, tiles_total: int, tiles_x: int,
                 tile_h: int, tile_w: int, img_h: int = 0, img_w: int = 0,
                 backend: str = "pallas", interpret: bool = False,
                 cache: Optional[RasterCache] = None) -> RasterStats:
    """Per-point densification statistics from a loss cotangent.

    Functional analogue of the reference's in-backward statistic
    accumulation: weight_sum / frag_count (raster.cu:289-301) and the
    opacity-gradient first/second moments ("fragment_err",
    raster.cu:779-820, wrapper.py:496-500).  Pass the ``cache`` returned by
    :func:`rasterize` to skip re-packing the entry table.
    """
    if backend == "jnp":
        # the backward kernel is the only implementation of the fragment
        # statistics; run it interpreted on non-TPU backends
        interpret = True
    nchan, m = color.shape
    color4 = color if nchan == 4 else jnp.pad(color, ((0, 4 - nchan), (0, 0)))
    d4 = (d_tiles_color if d_tiles_color.shape[1] == 4 else
          jnp.pad(d_tiles_color, ((0, 0), (0, 4 - nchan), (0, 0))))
    acc4 = (out_tiles_color if out_tiles_color.shape[1] == 4 else
            jnp.pad(out_tiles_color, ((0, 0), (0, 4 - nchan), (0, 0))))
    out_tiles = jnp.concatenate(
        [acc4, out_tiles_trans[:, None, :],
         jnp.zeros_like(out_tiles_trans[:, None, :]).repeat(3, axis=1)],
        axis=1)
    if cache is None:
        cache = build_cache(mean_pix, inv_cov, color4, opacity, table,
                            tiles_total, tiles_x, tile_h, tile_w,
                            has_depth=nchan == 4)
    grads16 = _backward_entry_grads(
        cache, out_tiles, d4, d_tiles_trans,
        tiles_total, tile_h, tile_w, interpret,
        has_depth=nchan == 4, with_stats=True)
    e = table.sorted_point.shape[0]
    g16 = jnp.where(table.entry_valid[None, :], grads16[:, :e], 0.0)
    params = cache.packed.params
    op_e = jnp.maximum(params[15, :e], 1e-12)
    conv = raster_pallas.moments_to_grads(
        g16, cache.packed.mu_local, params[12:15, :e], op_e)
    cols = [g16[11], g16[12], g16[10] / op_e, g16[13] / (op_e * op_e),
            conv["d_mean"][0], conv["d_mean"][1]]
    red = reduce_entries_to_points(cols, table, m)          # [6, M]
    # positional gradient in NDC units (ndc_to_pixel: px = (x*.5+.5)*W)
    sx = 0.5 * (img_w if img_w else tiles_x * tile_w)
    sy = 0.5 * (img_h if img_h else (tiles_total // tiles_x) * tile_h)
    grad_norm = jnp.sqrt((red[4] * sx) ** 2 + (red[5] * sy) ** 2)
    return RasterStats(weight_sum=red[0], frag_count=red[1],
                       err_sum=red[2], err_square_sum=red[3],
                       grad_norm=grad_norm)
