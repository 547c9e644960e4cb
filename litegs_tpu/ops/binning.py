"""Tile binning: build the per-tile depth-sorted gaussian table.

The reference pipeline (binning.cu / speedy_splat.cuh) is:
  1. per-point visibility + exact ellipse/tile-row intersection *count*
     (get_allocate_size_kernel, binning.cu:289-385),
  2. depth-sort points, prefix-sum counts (wrapper.py:739-745),
  3. scatter (tile, point) pairs at prefix offsets (create_table),
  4. cub radix-sort pairs by tile, then tile_range start indices.

TPU-native redesign (no scatter, no atomics, static shapes):
  1. the same visibility test and *closed-form* exact ellipse/tile-row
     intersection, evaluated independently per (point, tile-row) pair --
     the AccuTile loop (speedy_splat.cuh:88-147) becomes data parallelism;
  2. depth-sort points with a single 32-bit key sort;
  3. expand variable counts into static-capacity flat arrays with
     rank-decode gathers (cumsum + vectorized binary search) instead of
     scatter: entry -> (owner, rank) is closed-form, and rank -> tile is
     closed-form arithmetic, so emission is a pure gather;
  4. per-tile ranges computed BEFORE the sort from the row spans (a +1/-1
     difference array at row scale), which lets the kernels' 128-alignment
     pads ride the one stable tile sort as extra keyed entries -- the
     sorted output IS the aligned table.

The exact intersection semantics match the reference: a tile is emitted iff
the convex region {q <= t} with q the inv-covariance quadratic and
t = 2 ln(255 * opacity) intersects the tile rectangle (both computations
project ellipse-slab intersections, which is exact for convex sets).
"""
from __future__ import annotations

import math
import os
from typing import NamedTuple

import jax
import jax.numpy as jnp

from . import scan
from ..config import BINNING_STREAM, RASTER_BLOCK


class BinningResult(NamedTuple):
    sorted_point: jax.Array    # [E_cap] int32 point index per table entry
    sorted_tile: jax.Array     # [E_cap] int32 tile id (== tiles_total pad)
    entry_valid: jax.Array     # [E_cap] bool
    tile_start: jax.Array      # [T] int32 start offset per tile
    tile_count: jax.Array      # [T] int32 entries per tile
    num_entries: jax.Array     # scalar int32 (true, pre-clamp)
    num_aligned: jax.Array     # scalar int32 entries + per-tile 128-pad
    num_rows: jax.Array        # scalar int32 (true (point,tile-row) pairs)
    primitive_visible: jax.Array  # [M] bool: point touches >= 1 tile
    point_counts: jax.Array    # [M] int32 table entries per point
    overflow: jax.Array        # scalar bool: any capacity exceeded


def concat_tables(tables, tiles_total: int, m: int) -> BinningResult:
    """Merge B per-view tile tables into ONE table over a B*T tile grid.

    The batched raster path (reference batch axis ``B``, raster.cu:182):
    view v's tiles shift to [v*T, (v+1)*T), its point ids to [v*m,
    (v+1)*m), and its entries keep their slots at offset v*E_len -- the
    result is a valid BinningResult for ONE rasterize() call over B*T
    tiles (blocks stay single-tile, per-tile depth order is untouched,
    padding entries map to the global pad id B*T).  One kernel launch and
    one entry pack/reduce then serve all B views, amortizing their fixed
    costs; the per-point reduce yields [*, B*m] gradients whose cotangent
    splits back through each view's projection chain.
    """
    b = len(tables)
    e_len = tables[0].sorted_point.shape[0]
    sp, st, ev, ts, tc, pv, pc = [], [], [], [], [], [], []
    for v, t in enumerate(tables):
        sp.append(t.sorted_point + v * m)
        st.append(jnp.where(t.sorted_tile >= tiles_total,
                            b * tiles_total, t.sorted_tile + v * tiles_total))
        ev.append(t.entry_valid)
        ts.append(t.tile_start + v * e_len)
        tc.append(t.tile_count)
        pv.append(t.primitive_visible)
        pc.append(t.point_counts)
    cat = jnp.concatenate
    return BinningResult(
        sorted_point=cat(sp), sorted_tile=cat(st), entry_valid=cat(ev),
        tile_start=cat(ts), tile_count=cat(tc),
        num_entries=sum(t.num_entries for t in tables),
        num_aligned=sum(t.num_aligned for t in tables),
        num_rows=sum(t.num_rows for t in tables),
        primitive_visible=cat(pv), point_counts=cat(pc),
        overflow=jnp.any(jnp.stack([t.overflow for t in tables])))


def expand_by_counts(counts, capacity: int):
    """Decode flat slots of a variable-length concatenation.

    Given per-item counts, slot e of the concatenation belongs to item
    ``owner[e]`` at ``rank[e]``.  This replaces the reference's prefix-sum +
    scatter emission (binning.cu:33-110) with a boundary scatter + two
    cumulative-max scans -- the only primitives that are fast on TPU for
    this (binary-search gather loops lower ~100x slower through XLA).

    Returns (owner [cap] int32, rank [cap] int32, valid [cap] bool,
    total scalar int32).
    """
    m = counts.shape[0]
    # fence: keep upstream producer chains out of the cumsum/scatter (XLA
    # would otherwise re-evaluate them once per scan pass)
    counts = jax.lax.optimization_barrier(counts.astype(jnp.int32))
    cum = scan.cumsum(counts)
    total = cum[-1]
    starts = cum - counts
    # scatter each non-empty item's index & start at its first slot; items
    # with count > 0 have strictly increasing starts (>= 1 slot each), so
    # indices are unique; empty items are routed out of bounds and dropped
    sidx = jnp.where(counts > 0, starts, capacity)
    item_ids = jnp.arange(m, dtype=jnp.int32)
    # .set, not .max: indices are unique and values non-negative over a
    # zero base, so the result is identical and the scatter ~25% cheaper
    # (scripts/microbench_reduce2.py scatter_perm_set vs _max)
    owner = scan.cummax(
        jnp.zeros((capacity,), jnp.int32).at[sidx].set(
            item_ids, mode="drop", unique_indices=True))
    start_of = scan.cummax(
        jnp.zeros((capacity,), jnp.int32).at[sidx].set(
            starts, mode="drop", unique_indices=True))
    slots = jnp.arange(capacity, dtype=jnp.int32)
    rank = slots - start_of
    valid = slots < total
    return owner, rank, valid, total


def expand_with_table(counts, capacity: int, table):
    """expand_by_counts + fetch of per-item payload columns in ONE
    row-gather.

    Measured (scripts/microbench_r2.py on the v5e): a [m, K] row-gather
    costs the same as a single 1-D gather (~82 ms vs ~100 ms at 4.8M
    indices for K=8) because the per-index overhead dominates -- so
    fetching the item's start offset *and* all K payload values per
    expanded slot costs one gather instead of K+1.  This replaces one of
    the two cummax scans of expand_by_counts (start_of) and every
    per-column ``jnp.take`` the caller would otherwise issue.

    Args:
      counts: [m] int32 per-item expansion counts.
      capacity: static output length.
      table: [m, K] f32 per-item payload.  Integer columns MUST be encoded
        as exact f32 VALUES (< 2^24), never bitcast: small int bit
        patterns are f32 *denormals* and the TPU flushes denormals to
        zero in compute/relayout paths (caught by the on-chip parity
        check -- interpret mode preserves bits and cannot see it).
    Returns (owner [cap] int32, rank [cap] int32, valid [cap] bool,
    total scalar, fetched [cap, K] f32).
    """
    m = counts.shape[0]
    assert capacity < (1 << 24), "start offsets must stay exact in f32"
    counts = jax.lax.optimization_barrier(counts.astype(jnp.int32))
    cum = scan.cumsum(counts)
    total = cum[-1]
    starts = cum - counts
    sidx = jnp.where(counts > 0, starts, capacity)
    item_ids = jnp.arange(m, dtype=jnp.int32)
    owner = scan.cummax(
        jnp.zeros((capacity,), jnp.int32).at[sidx].set(
            item_ids, mode="drop", unique_indices=True))
    # one row-gather fetches start + payloads for every slot
    full = jnp.concatenate(
        [starts.astype(jnp.float32)[:, None], table], axis=1)
    fetched = jnp.take(full, owner, axis=0)
    start_of = fetched[:, 0].astype(jnp.int32)
    slots = jnp.arange(capacity, dtype=jnp.int32)
    rank = slots - start_of
    valid = slots < total
    return owner, rank, valid, total, fetched[:, 1:]


def signed_bincount(idx, sign, n_bins: int, chunk: int = 512):
    """Exact ±1 histogram over a SMALL bin domain via chunked one-hot
    matmuls on the MXU.

    The XLA scatter form runs at the per-index floor (~36 ms at 3.9M
    indices); one-hot compare + [1,chunk]x[chunk,bins] dot per chunk
    measures 10 ms and is BIT-EXACT: {-1, 0, 1} are exact in bf16 and
    count magnitudes < 2^24 accumulate exactly in f32
    (scripts/microbench: onehot_matmul_scan vs segment_sum_pm1).  Only
    worthwhile while the one-hot stays small -- callers gate on n_bins.

    Args:
      idx:  [N] int32 bin per element; out-of-range values must already
            be routed to a dump bin < n_bins by the caller.
      sign: [N] f32 in {-1, 0, 1}.
      n_bins: static number of bins.
    Returns [n_bins] int32 counts.
    """
    n = idx.shape[0]
    pad_n = (-n) % chunk
    dump = n_bins - 1
    if pad_n:
        idx = jnp.pad(idx, (0, pad_n), constant_values=dump)
        sign = jnp.pad(sign, (0, pad_n))  # zero sign: no contribution
    tp = ((n_bins + 127) // 128) * 128
    ic = idx.reshape(-1, chunk)
    sc = sign.reshape(-1, chunk).astype(jnp.bfloat16)
    bins = jax.lax.broadcasted_iota(jnp.int32, (chunk, tp), 1)

    def body(acc, xs):
        ii, ss = xs
        onehot = (ii[:, None] == bins).astype(jnp.bfloat16)
        return acc + jax.lax.dot(ss[None, :], onehot,
                                 preferred_element_type=jnp.float32)[0], None

    acc0 = jnp.zeros((tp,), jnp.float32)
    out, _ = jax.lax.scan(body, acc0, (ic, sc))
    return out[:n_bins].astype(jnp.int32)


def tile_counts_for_rows(px, py, a, b, c, t, disc, row, tile_h, tile_w,
                         rect_min_x, rect_max_x):
    """Exact x-tile span of the ellipse within one tile row (vectorized).

    Closed form of the reference AccuTile slab walk (speedy_splat.cuh:88-127):
    the x-extremes of the convex region {q <= t} within the y-slab
    [row*tile_h, (row+1)*tile_h] are attained either at the global x-apex
    (if its y lies in the slab) or at a slab edge; clamping the apex height
    into the slab's y-interval (itself clamped to the ellipse's y-extent)
    selects the right case in one evaluation of the line-intersection
    formula x(y) = px + (-b h -+ sqrt(disc h^2 + t a)) / a.

    Returns (min_tile, count) per row.
    """
    dy_max = jnp.sqrt(jnp.maximum(-t * a / disc, 0.0))
    h0 = row * tile_h - py
    h1 = (row + 1) * tile_h - py
    h0c = jnp.clip(h0, -dy_max, dy_max)
    h1c = jnp.clip(h1, -dy_max, dy_max)
    # y-offset at which min-x / max-x are attained (dy = -(b/c) dx at the
    # x-extreme; dx_min = -sqrt(-t c / disc))
    dx_max = jnp.sqrt(jnp.maximum(-t * c / disc, 0.0))
    h_xmin = (b / c) * dx_max
    h_xmax = -h_xmin
    he_min = jnp.clip(h_xmin, h0c, h1c)
    he_max = jnp.clip(h_xmax, h0c, h1c)
    sq_min = jnp.sqrt(jnp.maximum(disc * he_min * he_min + t * a, 0.0))
    sq_max = jnp.sqrt(jnp.maximum(disc * he_max * he_max + t * a, 0.0))
    x_lo = px + (-b * he_min - sq_min) / a
    x_hi = px + (-b * he_max + sq_max) / a
    min_tile = jnp.clip(jnp.floor(x_lo / tile_w).astype(jnp.int32),
                        rect_min_x, rect_max_x)
    max_tile = jnp.clip(jnp.floor(x_hi / tile_w).astype(jnp.int32) + 1,
                        rect_min_x, rect_max_x)
    count = jnp.maximum(max_tile - min_tile, 0)
    return min_tile, count


def _y_span_in_xband(px, py, a, b, c, t, disc, x0, x1):
    """Exact y-extent of the ellipse {q <= t} within the x-band [x0, x1].

    The transpose of :func:`tile_counts_for_rows` (x <-> y, a <-> c): the
    y-extremes within a vertical band are attained either at the ellipse's
    global y-apex (if its x lies in the band) or on a band edge; clamping
    the apex's x-offset into the band (itself clamped to the ellipse's
    x-extent) selects the right case.  Used to TIGHTEN the emitted row
    range to rows whose x-span survives the image clip -- without it,
    edge-straddling ellipses (the 1.3 NDC guard band admits off-screen
    centers, binning.cu:301) emit rows whose every tile is off-image
    (count 0), which the streaming expansion kernels must not see and the
    tables pay for.  Removing zero-count rows never changes the entry set.
    """
    dx_max = jnp.sqrt(jnp.maximum(-t * c / disc, 0.0))
    e0 = jnp.clip(x0 - px, -dx_max, dx_max)
    e1 = jnp.clip(x1 - px, -dx_max, dx_max)
    dy_max = jnp.sqrt(jnp.maximum(-t * a / disc, 0.0))
    e_ymin = (b / a) * dy_max       # x-offset at the global y-min apex
    e_ymax = -e_ymin
    ee_min = jnp.clip(e_ymin, e0, e1)
    ee_max = jnp.clip(e_ymax, e0, e1)
    sq_min = jnp.sqrt(jnp.maximum(disc * ee_min * ee_min + t * c, 0.0))
    sq_max = jnp.sqrt(jnp.maximum(disc * ee_max * ee_max + t * c, 0.0))
    y_lo = py + (-b * ee_min - sq_min) / c
    y_hi = py + (-b * ee_max + sq_max) / c
    return y_lo, y_hi


def _ellipse_tile_rect(px, py, a_s, c_s, t_s, disc_s,
                       tile_h, tile_w, tiles_x, tiles_y):
    """Shared exact ellipse extent -> clipped tile rect (binning.cu:324-355).

    Single source of truth: the per-point pass, the per-row recompute and
    the sizing estimate must stay BIT-IDENTICAL (row counts are defined by
    one copy and consumed by another), so they all call this.
    Returns (dx_max, dy_max, min_x, max_x, min_y, max_y).
    """
    dx_max = jnp.sqrt(jnp.maximum(-t_s * c_s / disc_s, 0.0))
    dy_max = jnp.sqrt(jnp.maximum(-t_s * a_s / disc_s, 0.0))
    min_x = jnp.clip(jnp.floor((px - dx_max) / tile_w), 0,
                     tiles_x).astype(jnp.int32)
    max_x = jnp.clip(jnp.floor((px + dx_max + tile_w - 1) / tile_w), 0,
                     tiles_x).astype(jnp.int32)
    min_y = jnp.clip(jnp.floor((py - dy_max) / tile_h), 0,
                     tiles_y).astype(jnp.int32)
    max_y = jnp.clip(jnp.floor((py + dy_max + tile_h - 1) / tile_h), 0,
                     tiles_y).astype(jnp.int32)
    return dx_max, dy_max, min_x, max_x, min_y, max_y


def estimate_table_sizes(ndc, view_z, inv_cov2d, opacity, valid_mask,
                         img_h: int, img_w: int, tile_h: int, tile_w: int):
    """Cheap upper-bound sizing pass: no expansions, tiny memory.

    Returns [3] int32 (visible points, exact row count, entry upper bound
    from the tile-rect area -- the same bound the reference's legacy
    createTable used before speedy-splat, binning.cu:33-110).  Used to pick
    initial capacity buckets before the first full step compiles.
    """
    tiles_x = math.ceil(img_w / tile_w)
    tiles_y = math.ceil(img_h / tile_h)
    a, b, c = inv_cov2d[0], inv_cov2d[1], inv_cov2d[2]
    disc = b * b - a * c
    visible = ((jnp.abs(ndc[0]) <= 1.3) & (jnp.abs(ndc[1]) <= 1.3)
               & (view_z > 0.2) & (opacity >= 1.0 / 255.0)
               & (a > 0) & (c > 0) & (disc < 0) & valid_mask)
    px = (ndc[0] * 0.5 + 0.5) * img_w - 0.5
    py = (ndc[1] * 0.5 + 0.5) * img_h - 0.5
    t = 2.0 * jnp.log(jnp.maximum(opacity, 1e-12) * 255.0)
    safe = visible
    a_s = jnp.where(safe, a, 1.0)
    c_s = jnp.where(safe, c, 1.0)
    disc_s = jnp.where(safe, disc, -1.0)
    t_s = jnp.where(safe, t, 0.0)
    _, _, rmin_x, rmax_x, rmin_y, rmax_y = _ellipse_tile_rect(
        px, py, a_s, c_s, t_s, disc_s, tile_h, tile_w, tiles_x, tiles_y)
    rect_w = jnp.where(safe, (rmax_x - rmin_x).astype(jnp.float32), 0.0)
    rect_h = jnp.where(safe, (rmax_y - rmin_y).astype(jnp.float32), 0.0)
    n_vis = jnp.sum(visible, dtype=jnp.int32)
    n_rows = jnp.sum(rect_h, dtype=jnp.float32)
    # alignment pads live OUTSIDE entry_capacity (sorted in from a separate
    # static region), so the estimate is the raw tile-rect area
    n_entries = jnp.sum(rect_w * rect_h, dtype=jnp.float32)
    return jnp.stack([n_vis, n_rows.astype(jnp.int32),
                      n_entries.astype(jnp.int32)])


def _sps(capacity: int) -> int:
    """Largest streaming step size dividing a (128-aligned) capacity."""
    for s in (512, 256, 128):
        if capacity % s == 0:
            return s
    raise ValueError(f"capacity {capacity} not 128-aligned")


def build_tile_table(ndc, view_z, inv_cov2d, opacity, valid_mask,
                     img_h: int, img_w: int, tile_h: int, tile_w: int,
                     row_capacity: int, entry_capacity: int,
                     stream: bool = None) -> BinningResult:
    """Construct the depth-sorted per-tile gaussian table.

    Args:
      ndc:       [4, M] NDC positions.
      view_z:    [M] view-space depth.
      inv_cov2d: [3, M] inverse 2D covariance (a, b, c).
      opacity:   [M] activated opacities.
      valid_mask: [M] bool, False for padding slots.
      img_h..tile_w: static image/tile geometry.
      row_capacity / entry_capacity: static expansion capacities.
      stream: run the two expansions as streaming Pallas window kernels
        (default config.BINNING_STREAM, on TPU backends only -- off-TPU
        the kernels run in interpret mode, whose callback machinery
        breaks inside shard_map, so the config default never engages it
        there; tests opt in explicitly); a window overrun sets the
        overflow flag (same no-op-and-retry discipline as capacity
        overflow), which the tightened row emission makes ~impossible.
    """
    if stream is None:
        stream = BINNING_STREAM and jax.default_backend() == "tpu"
    m = ndc.shape[-1]
    tiles_x = math.ceil(img_w / tile_w)
    tiles_y = math.ceil(img_h / tile_h)
    tiles_total = tiles_x * tiles_y
    # the (row_y, min_tile_x) pack in expansion 2 uses base 8192
    assert tiles_x <= 8192 and tiles_y <= 8192, (tiles_x, tiles_y)

    a, b, c = inv_cov2d[0], inv_cov2d[1], inv_cov2d[2]
    disc = b * b - a * c
    # Visibility (binning.cu:319-320): NDC guard band 1.3, view z > 0.2,
    # opacity >= 1/255, inverse covariance positive definite.
    visible = ((jnp.abs(ndc[0]) <= 1.3) & (jnp.abs(ndc[1]) <= 1.3)
               & (view_z > 0.2) & (opacity >= 1.0 / 255.0)
               & (a > 0) & (c > 0) & (disc < 0) & valid_mask)

    # pixel center coords (binning.cu:315-316)
    px = (ndc[0] * 0.5 + 0.5) * img_w - 0.5
    py = (ndc[1] * 0.5 + 0.5) * img_h - 0.5
    t = 2.0 * jnp.log(jnp.maximum(opacity, 1e-12) * 255.0)

    safe = visible
    a_s = jnp.where(safe, a, 1.0)
    c_s = jnp.where(safe, c, 1.0)
    disc_s = jnp.where(safe, disc, -1.0)
    t_s = jnp.where(safe, t, 0.0)

    # ellipse bbox -> tile rect (binning.cu:324-355)
    _, _, rect_min_x, rect_max_x, rect_min_y, rect_max_y = \
        _ellipse_tile_rect(px, py, a_s, c_s, t_s, disc_s,
                           tile_h, tile_w, tiles_x, tiles_y)
    # tighten the row range to rows with a nonempty clipped x-span (every
    # emitted row then produces >= 1 entry, the precondition of the
    # streaming expansion): y-extent of ellipse ∩ [first tile's left edge,
    # last tile's right edge], rows overlapping it
    y_lo, y_hi = _y_span_in_xband(
        px, py, a_s, b, c_s, t_s, disc_s,
        rect_min_x.astype(jnp.float32) * tile_w,
        rect_max_x.astype(jnp.float32) * tile_w)
    row_min_y = jnp.clip(jnp.floor(y_lo / tile_h).astype(jnp.int32),
                         rect_min_y, rect_max_y)
    row_max_y = jnp.clip(jnp.floor(y_hi / tile_h).astype(jnp.int32) + 1,
                         rect_min_y, rect_max_y)
    n_rows = jnp.where(safe & (rect_max_x > rect_min_x),
                       jnp.maximum(row_max_y - row_min_y, 0), 0)

    # ---- depth order (wrapper.py:739-742): front-to-back over points ----
    # points emitting no rows sort to the tail so row counts > 0 form a
    # contiguous prefix in depth order (streaming-expansion precondition;
    # order among non-emitting points is irrelevant -- they emit nothing)
    z_key = jnp.where(visible & (n_rows > 0), view_z,
                      jnp.inf).astype(jnp.float32)
    _, depth_order = jax.lax.sort_key_val(
        z_key, jnp.arange(m, dtype=jnp.int32), is_stable=True)

    # ---- expansion 1: (point) -> (point, tile-row) ----
    # Per-point payload table (depth-sorted item order): the point id, the
    # 6 quadratic inputs and the point-level tile rect, fetched at row
    # level in expand_with_table's single row-gather (measured ~6x cheaper
    # than per-column 1-D gathers, scripts/microbench_r2.py).  Integer
    # columns ride as exact f32 VALUES (< 2^24) -- see expand_with_table's
    # denormal-flush note on why bitcasting is forbidden here.
    assert m < (1 << 24)
    # n_rows rides the row-gather as one more column (free) instead of a
    # separate [M] 1-D gather (~13 ms at 1M points)
    pt_table = jnp.stack([
        jnp.arange(m, dtype=jnp.float32), px, py, a_s, b, c_s, t_s,
        disc_s, rect_min_x.astype(jnp.float32),
        rect_max_x.astype(jnp.float32), row_min_y.astype(jnp.float32),
        n_rows.astype(jnp.float32),
    ], axis=1)
    pt_sorted = jnp.take(pt_table, depth_order, axis=0)
    rows_sorted = pt_sorted[:, 11].astype(jnp.int32)

    # stage-granular override for on-chip bisection/experiments: "12"
    # streams both expansions, "1"/"2" just one.  Read at TRACE time: set
    # it BEFORE the first jitted step traces -- a cached compiled step
    # keeps whatever selection it traced with (the knob is not part of
    # the jit cache key), exactly like config.BINNING_STREAM.
    _stages = os.environ.get("LITEGS_STREAM_STAGES", "12")
    stream1 = stream and "1" in _stages
    stream2 = stream and "2" in _stages
    interp = jax.default_backend() != "tpu"
    ok_windows = jnp.bool_(True)
    # bisect aid: run the streaming kernel IN the step but route the XLA
    # path's outputs downstream, selected by a runtime-false predicate
    # (jnp.where on traced data -- XLA cannot DCE the kernel).  Separates
    # "kernel execution faults in step context" from "downstream
    # consumption of the arbitrary tail faults".
    _shadow = bool(os.environ.get("LITEGS_STREAM_SHADOW"))
    if stream1:
        # Streaming expansion: owners advance monotonically, so a Pallas
        # window kernel replicates the 12 payload columns at sequential
        # rates instead of the ~7.5 ns/index random-gather floor.  The
        # depth key pushed zero-row points to the tail, so counts > 0 form
        # a contiguous prefix and window 256 is strictly sufficient.
        from .stream_gather import expand_attrs_windowed
        # [16, M] attr rows.  Construction order is load-bearing (r5
        # fault bisect, PERF.md r5 §1): pad the GATHER result's columns
        # (fuses into the row-gather), then materialize the transpose
        # behind an optimization_barrier before any further pad/consumer
        # -- the fused pad∘transpose∘gather chain XLA otherwise builds
        # miscompiles on this TPU runtime (allocator-layout-dependent
        # INVALID_ARGUMENT; reproduced with the Pallas kernel replaced
        # by zeros, so the kernel is not involved).
        attrs1 = jax.lax.optimization_barrier(
            jnp.pad(pt_sorted, ((0, 0), (0, 4))).T)
        sps1 = _sps(row_capacity)
        # bisect aid (shadow-only): run the kernel on constant operands to
        # separate "operand values/producers" from "kernel in context"
        if _shadow and os.environ.get("LITEGS_STREAM_ZERO"):
            attrs1 = jnp.zeros_like(attrs1)
            rows_in = jnp.ones_like(rows_sorted)
        else:
            rows_in = rows_sorted
        # counts > 0 prefix: owners advance <= sps per step, so window =
        # sps + 128 (alignment) is strictly sufficient
        av, row_rank, total_rows, ok1 = expand_attrs_windowed(
            attrs1, rows_in, row_capacity,
            window_items=sps1 + 128, slots_per_step=sps1,
            interpret=interp)
        ok_windows &= ok1
        row_valid = jnp.arange(row_capacity, dtype=jnp.int32) < total_rows
        row_pt = av[0].astype(jnp.int32)
        r_px, r_py = av[1], av[2]
        r_a, r_b, r_c, r_t = av[3], av[4], av[5], av[6]
        r_disc = jnp.where(row_valid, av[7], -1.0)
        r_min_x = av[8].astype(jnp.int32)
        r_max_x = av[9].astype(jnp.int32)
        r_min_y = av[10].astype(jnp.int32)
        if _shadow:
            _, x_rank, x_valid, x_total, xv = expand_with_table(
                rows_sorted, row_capacity, pt_sorted)
            live = total_rows < 0            # runtime False
            row_rank = jnp.where(live, row_rank, x_rank)
            row_valid = jnp.where(live, row_valid, x_valid)
            total_rows = jnp.where(live, total_rows, x_total)
            row_pt = jnp.where(live, row_pt, xv[:, 0].astype(jnp.int32))
            r_px = jnp.where(live, r_px, xv[:, 1])
            r_py = jnp.where(live, r_py, xv[:, 2])
            r_a = jnp.where(live, r_a, xv[:, 3])
            r_b = jnp.where(live, r_b, xv[:, 4])
            r_c = jnp.where(live, r_c, xv[:, 5])
            r_t = jnp.where(live, r_t, xv[:, 6])
            r_disc = jnp.where(live, r_disc,
                               jnp.where(x_valid, xv[:, 7], -1.0))
            r_min_x = jnp.where(live, r_min_x, xv[:, 8].astype(jnp.int32))
            r_max_x = jnp.where(live, r_max_x, xv[:, 9].astype(jnp.int32))
            r_min_y = jnp.where(live, r_min_y, xv[:, 10].astype(jnp.int32))
    else:
        # pass all 12 columns (a row-gather's cost is per-index,
        # independent of K); rv[:, 11] is rows_sorted again, ignored
        row_owner, row_rank, row_valid, total_rows, rv = expand_with_table(
            rows_sorted, row_capacity, pt_sorted)
        row_pt = rv[:, 0].astype(jnp.int32)          # original point index
        r_px, r_py = rv[:, 1], rv[:, 2]
        r_a, r_b, r_c, r_t = rv[:, 3], rv[:, 4], rv[:, 5], rv[:, 6]
        r_disc = jnp.where(row_valid, rv[:, 7], -1.0)
        r_min_x = rv[:, 8].astype(jnp.int32)
        r_max_x = rv[:, 9].astype(jnp.int32)
        r_min_y = rv[:, 10].astype(jnp.int32)

    row_y = r_min_y + row_rank
    min_tile_x, row_tiles = tile_counts_for_rows(
        r_px, r_py, r_a, r_b, r_c, r_t, r_disc,
        row_y.astype(jnp.float32), float(tile_h), float(tile_w),
        r_min_x, r_max_x)
    row_tiles = jnp.where(row_valid, row_tiles, 0)

    # ---- expansion 2: (point, row) -> (point, row, tile) = table entry ----
    if stream2:
        from .stream_gather import expand_attrs_windowed
        attrs2 = jnp.stack(
            [row_pt.astype(jnp.float32), row_y.astype(jnp.float32),
             min_tile_x.astype(jnp.float32)]
            + [jnp.zeros((row_capacity,), jnp.float32)] * 5, axis=0)
        attrs2 = jax.lax.optimization_barrier(attrs2)
        sps2 = _sps(entry_capacity)
        # rows are tightened to >= 1 tile each; the +256 slack absorbs any
        # f32-tangency zero-count stragglers (a window overrun only sets
        # the overflow flag -- never corrupts)
        ev2, ent_rank, total_entries, ok2 = expand_attrs_windowed(
            attrs2, row_tiles, entry_capacity,
            window_items=sps2 + 256, slots_per_step=sps2,
            interpret=interp)
        ok_windows &= ok2
        ent_valid = (jnp.arange(entry_capacity, dtype=jnp.int32)
                     < total_entries)
        ent_pt = ev2[0].astype(jnp.int32)
        ent_tile = (ev2[1].astype(jnp.int32) * tiles_x
                    + ev2[2].astype(jnp.int32) + ent_rank)
    else:
        # row-level payload: ids/coords as exact f32 values
        row_table = jnp.stack([row_pt.astype(jnp.float32),
                               row_y.astype(jnp.float32),
                               min_tile_x.astype(jnp.float32)], axis=1)
        # Materialization fence: without it XLA fuses the whole gather+
        # sqrt chain above INTO the cumsum/scatter consumers below and
        # re-evaluates it per scan pass (~20x recompute; 5 ms -> 100 ms).
        row_table, row_tiles = jax.lax.optimization_barrier(
            (row_table, row_tiles))
        ent_owner, ent_rank, ent_valid, total_entries, ev = \
            expand_with_table(row_tiles, entry_capacity, row_table)
        ent_pt = ev[:, 0].astype(jnp.int32)
        ent_tile = (ev[:, 1].astype(jnp.int32) * tiles_x
                    + ev[:, 2].astype(jnp.int32) + ent_rank)
    ent_tile, ent_pt, ent_valid = jax.lax.optimization_barrier(
        (ent_tile, ent_pt, ent_valid))

    # ---- per-tile counts BEFORE the sort (binning.cu:228-265
    # tile_range_kernel equivalent) ----
    # Each row emits entries to the contiguous tile range [g0, g0+cnt)
    # within one tile row, so per-tile totals are a +1/-1 difference array
    # scattered at ROW scale plus one cumsum over the (tiny) tile axis --
    # no E-scale searchsorted / scatter-count over the sorted table needed.
    g0 = row_y * tiles_x + min_tile_x                       # [R]
    has = row_tiles > 0                                     # valid rows only
    t1 = tiles_total + 1
    edge_idx = jnp.concatenate([jnp.where(has, g0, tiles_total),
                                jnp.where(has, g0 + row_tiles, tiles_total)])
    edge_sign = jnp.concatenate([has.astype(jnp.float32),
                                 -has.astype(jnp.float32)])
    if t1 <= 4096:
        # MXU one-hot histogram: 3.5x the scatter's speed, bit-exact
        diff = signed_bincount(edge_idx, edge_sign, t1)
    else:
        diff = jax.ops.segment_sum(
            edge_sign.astype(jnp.int32), edge_idx, num_segments=t1)
    tile_count = jnp.cumsum(diff)[:tiles_total]

    # ---- 128-alignment as SORT PARTICIPANTS ----
    # The Pallas rasterizer DMAs gaussian blocks of 128 per tile.  Knowing
    # the per-tile counts up front, the alignment pads are emitted as extra
    # entries with the tile's key and sorted together with the real ones:
    # the stable tile sort then produces the aligned table DIRECTLY (pads
    # placed after the concat region sort behind every real same-tile
    # entry), deleting the former post-sort expansion (a capacity-scale
    # cummax + two capacity-scale gathers).
    blk = RASTER_BLOCK
    blocks = (tile_count + blk - 1) // blk
    aligned_cnt = blocks * blk
    acum = jnp.cumsum(aligned_cnt)
    total_aligned = acum[-1]
    aligned_start = acum - aligned_cnt
    pad_cap = ((tiles_total * (blk - 1) + blk - 1) // blk) * blk
    # the kernels stride the sorted table in blocks of blk: grow the pad
    # region so the TOTAL length is a blk multiple whatever the (128-
    # aligned) entry_capacity is
    rem = (entry_capacity + pad_cap) % blk
    if rem:
        pad_cap += blk - rem
    pad_owner, _, pad_valid, _ = expand_by_counts(
        aligned_cnt - tile_count, pad_cap)
    pad_key = jnp.where(pad_valid, pad_owner, tiles_total)

    # ---- stable sort by tile: (tile, depth) order, pads trailing ----
    tile_key = jnp.where(ent_valid, ent_tile, tiles_total).astype(jnp.int32)
    keys = jnp.concatenate([tile_key, pad_key.astype(jnp.int32)])
    pts = jnp.concatenate([ent_pt, jnp.zeros((pad_cap,), jnp.int32)])
    real = jnp.concatenate([ent_valid.astype(jnp.int32),
                            jnp.zeros((pad_cap,), jnp.int32)])
    sorted_key, sorted_point, sorted_real = jax.lax.sort(
        (keys, pts, real), num_keys=1, is_stable=True)

    overflow = ((total_rows > row_capacity)
                | (total_entries > entry_capacity)
                | jnp.logical_not(ok_windows))
    # On overflow the truncated entry set no longer matches the pre-sort
    # counts (segments would misalign and blocks could mix tiles), so the
    # whole table is invalidated: the step renders empty, the flag reports
    # it, and the trainer re-runs the view with bigger buckets -- never a
    # plausible-looking corrupt render (never-truncate discipline,
    # binning.cu:137-169 / compact.cu:527-551).
    valid_al = (sorted_real == 1) & jnp.logical_not(overflow)

    # clamped so block DMAs stay in bounds even when the table overflows;
    # counts are zeroed wholesale on overflow -- they describe the
    # truncated-away table, and a count > 0 for a tile whose blocks were
    # lost would unmask that tile's uninitialized kernel output row
    length = entry_capacity + pad_cap
    aligned_start = jnp.minimum(aligned_start, length)
    tile_count = jnp.where(overflow, 0,
                           jnp.minimum(tile_count, length - aligned_start))

    # per-point visibility = touches >= 1 tile (get_allocate_size != 0);
    # the counts themselves are the backward reduce's segment boundaries
    ent_counts = jax.ops.segment_sum(
        jnp.where(row_valid, row_tiles, 0), row_pt, num_segments=m)
    primitive_visible = ent_counts > 0

    return BinningResult(sorted_point=sorted_point.astype(jnp.int32),
                         sorted_tile=sorted_key.astype(jnp.int32),
                         entry_valid=valid_al,
                         tile_start=aligned_start,
                         tile_count=tile_count,
                         num_entries=total_entries,
                         num_aligned=total_aligned,
                         num_rows=total_rows,
                         primitive_visible=primitive_visible,
                         point_counts=ent_counts.astype(jnp.int32),
                         overflow=overflow)
