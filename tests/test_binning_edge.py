"""Binning + raster robustness at the edges: degenerate inputs must be
excluded cleanly (never crash, never corrupt memory, overflow flagged)."""
import jax
import jax.numpy as jnp
import numpy as np

from litegs_tpu.ops import binning, raster

IMG_H, IMG_W, TILE_H, TILE_W = 32, 64, 8, 16
TILES_X = IMG_W // TILE_W
TILES_TOTAL = (IMG_H // TILE_H) * TILES_X
CAPS = (2048, 4096)


def build(ndc_xy, z, inv=None, op=None, valid=None):
    n = ndc_xy.shape[1]
    ndc = jnp.concatenate([jnp.asarray(ndc_xy, jnp.float32),
                           jnp.zeros((1, n)), jnp.ones((1, n))], axis=0)
    inv = jnp.asarray(inv if inv is not None
                      else np.tile([[0.5], [0.0], [0.5]], (1, n)),
                      jnp.float32)
    op = jnp.asarray(op if op is not None else np.full(n, 0.8), jnp.float32)
    valid = jnp.asarray(valid if valid is not None else np.ones(n, bool))
    return binning.build_tile_table(ndc, jnp.asarray(z, jnp.float32), inv,
                                    op, valid, IMG_H, IMG_W, TILE_H,
                                    TILE_W, *CAPS)


def test_behind_camera_and_guard_band_excluded():
    ndc = np.array([[0.0, 0.0, 2.0, -2.0, 0.5],
                    [0.0, 0.0, 0.0, 0.0, 0.5]])
    z = np.array([1.0, 0.1, 1.0, 1.0, 1.0])  # second: z <= 0.2 near plane
    t = build(ndc, z)
    vis = np.asarray(t.primitive_visible)
    assert vis[0] and vis[4]
    assert not vis[1] and not vis[2] and not vis[3]


def test_zero_opacity_and_bad_covariance_excluded():
    n = 4
    ndc = np.zeros((2, n))
    z = np.ones(n)
    op = np.array([0.5, 1e-4, 0.5, 0.5])           # below 1/255
    inv = np.tile([[0.5], [0.0], [0.5]], (1, n))
    inv[:, 2] = [-0.5, 0.0, -0.5]                  # not PSD
    inv[:, 3] = [0.1, 0.9, 0.1]                    # disc >= 0
    t = build(ndc, z, inv=inv, op=op)
    vis = np.asarray(t.primitive_visible)
    assert vis[0] and not vis[1] and not vis[2] and not vis[3]


def test_nan_inputs_do_not_crash_or_leak():
    ndc = np.array([[0.0, np.nan], [0.0, np.nan]])
    z = np.array([1.0, np.nan])
    t = build(ndc, z)
    vis = np.asarray(t.primitive_visible)
    assert vis[0] and not vis[1]
    assert np.isfinite(np.asarray(t.tile_start)).all()


def test_empty_scene_renders_background():
    ndc = np.zeros((2, 3))
    t = build(ndc, np.ones(3), op=np.zeros(3))
    assert int(t.num_entries) == 0
    mean = jnp.zeros((2, 3))
    inv = jnp.asarray(np.tile([[0.5], [0.0], [0.5]], (1, 3)), jnp.float32)
    color = jnp.ones((3, 3))
    op = jnp.zeros(3)
    col, trans, _ = raster.rasterize(mean, inv, color, op, t, TILES_TOTAL,
                                     TILES_X, TILE_H, TILE_W,
                                     backend="pallas", interpret=True)
    assert float(jnp.abs(col).max()) == 0.0
    assert float(jnp.abs(trans - 1.0).max()) == 0.0


def test_giant_gaussian_covers_every_tile():
    ndc = np.zeros((2, 1))
    inv = np.array([[1e-5], [0.0], [1e-5]])
    t = build(ndc, np.ones(1), inv=inv)
    assert int(t.num_entries) == TILES_TOTAL
    assert np.all(np.asarray(t.tile_count) == 1)


def test_overflow_clamps_in_bounds():
    # 64 giant gaussians x 16 tiles = 1024 entries, capacity 256 -> overflow
    n = 64
    ndc = np.zeros((2, n))
    inv = np.tile([[1e-5], [0.0], [1e-5]], (1, n))
    ndc4 = jnp.concatenate([jnp.asarray(ndc, jnp.float32),
                            jnp.zeros((1, n)), jnp.ones((1, n))], axis=0)
    t = binning.build_tile_table(
        ndc4, jnp.ones(n), jnp.asarray(inv, jnp.float32),
        jnp.full((n,), 0.8), jnp.ones(n, bool),
        IMG_H, IMG_W, TILE_H, TILE_W, 512, 256)
    assert bool(t.overflow)
    sp = np.asarray(t.sorted_point)
    ts = np.asarray(t.tile_start)
    tc = np.asarray(t.tile_count)
    length = sp.shape[0]  # entry_capacity + the static pad region
    assert sp.min() >= 0 and sp.max() < n
    assert np.all(ts >= 0) and np.all(ts <= length)
    assert np.all(ts + np.maximum(tc, 0) <= length)
    # rasterizing the overflowed table must still be safe
    mean = jnp.asarray((ndc * 0.5 + 0.5)
                       * [[IMG_W], [IMG_H]] - 0.5, jnp.float32)
    col, trans, _ = raster.rasterize(
        mean, jnp.asarray(inv, jnp.float32), jnp.ones((3, n)),
        jnp.full((n,), 0.8), t, TILES_TOTAL, TILES_X, TILE_H, TILE_W,
        backend="pallas", interpret=True)
    assert np.isfinite(np.asarray(col)).all()
