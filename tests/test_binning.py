"""Binning correctness: exact ellipse/tile intersection vs dense sampling."""
import math

import pytest

import jax.numpy as jnp
import numpy as np

from litegs_tpu.ops import binning
from util_scenes import random_screen_gaussians

IMG_H, IMG_W = 64, 96
TILE_H, TILE_W = 8, 16


def build(n=60, seed=0, row_cap=4096, ent_cap=8192):
    rng = np.random.default_rng(seed)
    mean, inv, color, op, z, ndc = random_screen_gaussians(
        rng, n, IMG_H, IMG_W)
    valid = jnp.ones(n, bool)
    table = binning.build_tile_table(ndc, z, inv, op, valid, IMG_H, IMG_W,
                                     TILE_H, TILE_W, row_cap, ent_cap)
    return (mean, inv, color, op, z, ndc), table


def test_expand_by_counts():
    counts = jnp.asarray([0, 3, 1, 0, 2, 0], jnp.int32)
    owner, rank, valid, total = binning.expand_by_counts(counts, 8)
    assert int(total) == 6
    np.testing.assert_array_equal(np.asarray(owner)[:6],
                                  [1, 1, 1, 2, 4, 4])
    np.testing.assert_array_equal(np.asarray(rank)[:6], [0, 1, 2, 0, 0, 1])
    np.testing.assert_array_equal(np.asarray(valid),
                                  [1, 1, 1, 1, 1, 1, 0, 0])


def test_expand_by_counts_random():
    rng = np.random.default_rng(0)
    counts = rng.integers(0, 5, 50).astype(np.int32)
    cap = int(counts.sum()) + 7
    owner, rank, valid, total = binning.expand_by_counts(
        jnp.asarray(counts), cap)
    want_owner = np.repeat(np.arange(50), counts)
    want_rank = np.concatenate([np.arange(c) for c in counts])
    assert int(total) == counts.sum()
    np.testing.assert_array_equal(np.asarray(owner)[:total], want_owner)
    np.testing.assert_array_equal(np.asarray(rank)[:total], want_rank)
    np.testing.assert_array_equal(np.asarray(valid),
                                  np.arange(cap) < counts.sum())


def _rect_bounds(mean, inv, op):
    """Tile-rect clamp, replicating the reference's float +size-1 idiom
    (binning.cu:348-355): sub-pixel slivers into a neighboring tile row or
    column are intentionally dropped."""
    tiles_x = IMG_W // TILE_W
    tiles_y = IMG_H // TILE_H
    a, b, c = np.asarray(inv, np.float64)
    px, py = np.asarray(mean, np.float64)
    t = 2 * np.log(255 * np.asarray(op, np.float64))
    disc = b * b - a * c
    dx_max = np.sqrt(np.maximum(-t * c / disc, 0))
    dy_max = np.sqrt(np.maximum(-t * a / disc, 0))
    rx0 = np.clip(np.floor((px - dx_max) / TILE_W), 0, tiles_x).astype(int)
    rx1 = np.clip(np.floor((px + dx_max + TILE_W - 1) / TILE_W), 0,
                  tiles_x).astype(int)
    ry0 = np.clip(np.floor((py - dy_max) / TILE_H), 0, tiles_y).astype(int)
    ry1 = np.clip(np.floor((py + dy_max + TILE_H - 1) / TILE_H), 0,
                  tiles_y).astype(int)
    return rx0, rx1, ry0, ry1


def _sampled_tile_incidence(mean, inv, op, n, samples=9, shrink=1.0,
                            respect_rect=True):
    """Dense-sample q over each tile: incidence[point, tile] where
    min_sampled q <= 2 ln(255 op), optionally restricted to the reference's
    tile rect."""
    tiles_x = IMG_W // TILE_W
    tiles_y = IMG_H // TILE_H
    a, b, c = np.asarray(inv)
    px, py = np.asarray(mean)
    t = 2 * np.log(255 * np.asarray(op)) * shrink
    inc = np.zeros((n, tiles_y * tiles_x), bool)
    ys = np.linspace(0, 1, samples)
    xs = np.linspace(0, 1, samples)
    for ty in range(tiles_y):
        for tx in range(tiles_x):
            gx, gy = np.meshgrid(tx * TILE_W + xs * TILE_W,
                                 ty * TILE_H + ys * TILE_H)
            dx = px[:, None] - gx.ravel()[None, :]
            dy = py[:, None] - gy.ravel()[None, :]
            q = (a[:, None] * dx ** 2 + 2 * b[:, None] * dx * dy
                 + c[:, None] * dy ** 2)
            inc[:, ty * tiles_x + tx] = q.min(axis=1) <= t
    if respect_rect:
        rx0, rx1, ry0, ry1 = _rect_bounds(mean, inv, op)
        col = np.arange(tiles_x)[None, None, :]
        row = np.arange(tiles_y)[None, :, None]
        in_rect = ((col >= rx0[:, None, None]) & (col < rx1[:, None, None])
                   & (row >= ry0[:, None, None]) & (row < ry1[:, None, None]))
        inc &= in_rect.reshape(n, -1)
    return inc


def test_tile_table_vs_sampling():
    (mean, inv, color, op, z, ndc), table = build(n=50, seed=3)
    n = 50
    tiles_total = (IMG_H // TILE_H) * (IMG_W // TILE_W)
    # emitted incidence
    emitted = np.zeros((n, tiles_total), bool)
    sp = np.asarray(table.sorted_point)
    st = np.asarray(table.sorted_tile)
    ev = np.asarray(table.entry_valid)
    for p, t, v in zip(sp, st, ev):
        if v:
            assert not emitted[p, t], "duplicate (point, tile) entry"
            emitted[p, t] = True
    # shrink slightly so float32 boundary rounding can't flip the verdict
    inc = _sampled_tile_incidence(mean, inv, op, n, shrink=1 - 1e-4)
    # every sampled-hit tile (within the reference tile rect) must be
    # emitted; sampling underestimates the true intersection, so this
    # direction is strict
    missing = inc & ~emitted
    assert not missing.any(), f"{missing.sum()} sampled tiles not emitted"
    # emitted tiles must at least intersect a slightly inflated ellipse
    inc_loose = _sampled_tile_incidence(mean, inv * 0.8, op, n, samples=17,
                                        respect_rect=False)
    bogus = emitted & ~inc_loose
    assert bogus.mean() < 0.05, f"too many spurious tiles: {bogus.sum()}"


def test_depth_order_within_tiles():
    (mean, inv, color, op, z, ndc), table = build(n=80, seed=4)
    sp = np.asarray(table.sorted_point)
    st = np.asarray(table.sorted_tile)
    ev = np.asarray(table.entry_valid)
    zs = np.asarray(z)
    for t in np.unique(st[ev]):
        pts = sp[(st == t) & ev]
        depths = zs[pts]
        assert (np.diff(depths) >= 0).all(), f"tile {t} not depth sorted"


def test_tile_ranges_consistent():
    _, table = build(n=80, seed=5)
    st = np.asarray(table.sorted_tile)
    ev = np.asarray(table.entry_valid)
    starts = np.asarray(table.tile_start)
    counts = np.asarray(table.tile_count)
    tiles_total = starts.shape[0]
    for t in range(tiles_total):
        want = np.flatnonzero((st == t) & ev)
        assert counts[t] == want.size
        if want.size:
            assert starts[t] == want[0]
    assert int(table.num_entries) == int(ev.sum())
    assert not bool(table.overflow)


def test_block_single_tile_invariant():
    """Every 128-slot block of the sorted table belongs to ONE tile, with
    real entries leading and alignment pads trailing -- the structural
    contract the Pallas kernels' block grid relies on (pads now ride the
    tile sort instead of a post-sort expansion)."""
    _, table = build(n=120, seed=7)
    st = np.asarray(table.sorted_tile)
    ev = np.asarray(table.entry_valid)
    length = st.shape[0]
    assert length % 128 == 0
    for b in range(length // 128):
        bt = st[b * 128:(b + 1) * 128]
        bv = ev[b * 128:(b + 1) * 128]
        if bv.any():
            assert (bt[bv] == bt[0]).all(), f"block {b} mixes tiles"
            assert bv[0], f"block {b} does not start with a real entry"
            # real entries form a prefix (pads never interleave)
            first_pad = np.argmin(bv) if not bv.all() else 128
            assert not bv[first_pad:].any()
    assert (np.asarray(table.tile_start) % 128 == 0).all()


def test_overflow_flag():
    rng = np.random.default_rng(6)
    mean, inv, color, op, z, ndc = random_screen_gaussians(
        rng, 64, IMG_H, IMG_W, scale_px=(20.0, 40.0))
    valid = jnp.ones(64, bool)
    table = binning.build_tile_table(ndc, z, inv, op, valid, IMG_H, IMG_W,
                                     TILE_H, TILE_W, 128, 128)
    assert bool(table.overflow)


def test_signed_bincount_exact():
    """The MXU one-hot histogram must be BIT-exact vs np.add.at for ±1
    values, including the chunk padding path and the dump bin."""
    rng = np.random.default_rng(9)
    for n, bins in ((1000, 37), (4096, 1108), (5000, 130)):
        idx = jnp.asarray(rng.integers(0, bins, n), jnp.int32)
        sign = jnp.asarray(rng.choice([-1.0, 0.0, 1.0], n), jnp.float32)
        got = np.asarray(
            binning.signed_bincount(idx, sign, bins))
        want = np.zeros(bins, np.int64)
        np.add.at(want, np.asarray(idx), np.asarray(sign).astype(np.int64))
        assert (got == want).all(), (n, bins)


def test_rows_tightened_nonempty():
    """Every emitted (point, tile-row) pair must produce >= 1 entry, and
    depth-sorted per-point row counts must form a contiguous prefix --
    the preconditions of the streaming expansion kernels.  Exercises
    edge-straddling ellipses (NDC guard band admits off-screen centers)
    whose un-tightened row ranges would emit all-clipped rows."""
    rng = np.random.default_rng(11)
    n = 200
    mean, inv, color, op, z, ndc = random_screen_gaussians(
        rng, n, IMG_H, IMG_W, scale_px=(4.0, 18.0))
    # push a third of the centers off-image (still inside the 1.3 guard)
    ndc = np.array(ndc, copy=True)
    ndc[0, :n // 3] = rng.uniform(1.0, 1.28, n // 3) * rng.choice(
        [-1, 1], n // 3)
    ndc = jnp.asarray(ndc)
    # keep the sampled oracle consistent with the mutated centers
    mean = jnp.stack([(ndc[0] * 0.5 + 0.5) * IMG_W - 0.5,
                      (ndc[1] * 0.5 + 0.5) * IMG_H - 0.5])
    valid = jnp.ones(n, bool)
    table = binning.build_tile_table(ndc, z, inv, op, valid, IMG_H, IMG_W,
                                     TILE_H, TILE_W, 16384, 32768)
    assert not bool(table.overflow)
    # re-derive per-row tile counts the way build_tile_table does
    import litegs_tpu.ops.binning as B
    a, b, c = inv[0], inv[1], inv[2]
    disc = b * b - a * c
    visible = ((jnp.abs(ndc[0]) <= 1.3) & (jnp.abs(ndc[1]) <= 1.3)
               & (z > 0.2) & (op >= 1.0 / 255.0)
               & (a > 0) & (c > 0) & (disc < 0))
    px = (ndc[0] * 0.5 + 0.5) * IMG_W - 0.5
    py = (ndc[1] * 0.5 + 0.5) * IMG_H - 0.5
    t = 2.0 * jnp.log(jnp.maximum(op, 1e-12) * 255.0)
    tiles_x = IMG_W // TILE_W
    tiles_y = IMG_H // TILE_H
    a_s = jnp.where(visible, a, 1.0)
    c_s = jnp.where(visible, c, 1.0)
    disc_s = jnp.where(visible, disc, -1.0)
    t_s = jnp.where(visible, t, 0.0)
    _, _, rx0, rx1, ry0, ry1 = B._ellipse_tile_rect(
        px, py, a_s, c_s, t_s, disc_s, TILE_H, TILE_W, tiles_x, tiles_y)
    ylo, yhi = B._y_span_in_xband(px, py, a_s, b, c_s, t_s, disc_s,
                                  rx0.astype(jnp.float32) * TILE_W,
                                  rx1.astype(jnp.float32) * TILE_W)
    rmin = jnp.clip(jnp.floor(ylo / TILE_H).astype(jnp.int32), ry0, ry1)
    rmax = jnp.clip(jnp.floor(yhi / TILE_H).astype(jnp.int32) + 1, ry0, ry1)
    n_rows = np.asarray(jnp.where(visible & (rx1 > rx0),
                                  jnp.maximum(rmax - rmin, 0), 0))
    empty_rows = 0
    for p in np.flatnonzero(n_rows):
        for r in range(int(np.asarray(rmin)[p]), int(np.asarray(rmax)[p])):
            mt, cnt = B.tile_counts_for_rows(
                px[p], py[p], a_s[p], b[p], c_s[p], t_s[p], disc_s[p],
                jnp.float32(r), float(TILE_H), float(TILE_W),
                rx0[p], rx1[p])
            if int(cnt) == 0:
                empty_rows += 1
    assert empty_rows == 0, f"{empty_rows} zero-count rows emitted"
    # tightening must not DROP entries: every sampled-hit tile emitted
    emitted = np.zeros((n, tiles_y * tiles_x), bool)
    sp = np.asarray(table.sorted_point)
    st = np.asarray(table.sorted_tile)
    ev = np.asarray(table.entry_valid)
    emitted[sp[ev], st[ev]] = True
    inc = _sampled_tile_incidence(mean, inv, op, n, shrink=1 - 1e-4)
    missing = inc & ~emitted
    assert not missing.any(), f"{missing.sum()} sampled tiles not emitted"


@pytest.mark.parametrize("stages", ["1", "2", "12"])
def test_stream_backend_bitexact(stages, monkeypatch):
    """The streaming-Pallas expansion path must produce a BIT-IDENTICAL
    table to the XLA gather path (same expansion order, same sort).

    Parameterized over LITEGS_STREAM_STAGES: the single-stage mixed paths
    (stream expansion 1 feeding the gather-based stage 2 and vice versa)
    are exactly what the on-chip bisection runs."""
    monkeypatch.setenv("LITEGS_STREAM_STAGES", stages)
    rng = np.random.default_rng(21)
    n = 300
    mean, inv, color, op, z, ndc = random_screen_gaussians(
        rng, n, IMG_H, IMG_W)
    valid = jnp.ones(n, bool)
    args = (ndc, z, inv, op, valid, IMG_H, IMG_W, TILE_H, TILE_W,
            16384, 32768)
    t_ref = binning.build_tile_table(*args, stream=False)
    t_str = binning.build_tile_table(*args, stream=True)
    assert not bool(t_ref.overflow) and not bool(t_str.overflow)
    for name in ("sorted_tile", "entry_valid", "tile_start", "tile_count",
                 "num_entries", "num_aligned", "num_rows",
                 "primitive_visible", "point_counts"):
        np.testing.assert_array_equal(
            np.asarray(getattr(t_ref, name)),
            np.asarray(getattr(t_str, name)), err_msg=name)
    # point ids compare only at valid slots: the garbage tail past the
    # true entry count is arbitrary by contract (both backends mask it)
    ev = np.asarray(t_ref.entry_valid)
    np.testing.assert_array_equal(np.asarray(t_ref.sorted_point)[ev],
                                  np.asarray(t_str.sorted_point)[ev])
