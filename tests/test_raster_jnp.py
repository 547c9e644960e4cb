"""jnp reference rasterizer vs an independent naive per-pixel oracle,
plus finite-difference gradient checks."""
import math

import jax
import jax.numpy as jnp
import numpy as np

from litegs_tpu.ops import binning, raster_jnp
from litegs_tpu.utils import math as um
from util_scenes import random_screen_gaussians

IMG_H, IMG_W = 40, 64
TILE_H, TILE_W = 8, 16
TILES_X = IMG_W // TILE_W
TILES_TOTAL = (IMG_H // TILE_H) * TILES_X


def build_scene(n=40, seed=0, caps=(4096, 8192)):
    rng = np.random.default_rng(seed)
    mean, inv, color, op, z, ndc = random_screen_gaussians(
        rng, n, IMG_H, IMG_W, scale_px=(1.0, 8.0))
    table = binning.build_tile_table(ndc, z, inv, op, jnp.ones(n, bool),
                                     IMG_H, IMG_W, TILE_H, TILE_W, *caps)
    assert not bool(table.overflow)
    return (mean, inv, color, op, z), table


def naive_render(mean, inv, color, op, z, incidence):
    """Sequential per-pixel oracle in float64, replicating the CUDA blend
    semantics (raster.cu:226-283): depth order, tile-gated contributions,
    alpha floor 1/256, clamp 255/256, stop at T <= 1/8192."""
    n = mean.shape[1]
    c = color.shape[0]
    img = np.zeros((c, IMG_H, IMG_W))
    trans = np.ones((IMG_H, IMG_W))
    frag_w = np.zeros(n)
    frag_c = np.zeros(n, np.int64)
    ys, xs = np.mgrid[0:IMG_H, 0:IMG_W]
    tile_of_pix = (ys // TILE_H) * TILES_X + (xs // TILE_W)
    order = np.argsort(np.asarray(z), kind="stable")
    mean, inv, color, op = map(np.asarray, (mean, inv, color, op))
    for p in order:
        gate = incidence[p][tile_of_pix]
        dx = mean[0, p] - xs
        dy = mean[1, p] - ys
        q = (inv[0, p] * dx ** 2 + 2 * inv[1, p] * dx * dy
             + inv[2, p] * dy ** 2)
        alpha = op[p] * np.exp(-0.5 * q)
        ok = gate & (alpha >= 1 / 256) & (trans > 1 / 8192)
        alpha = np.where(ok, np.minimum(alpha, 255 / 256), 0.0)
        w = alpha * trans
        img += color[:, p, None, None] * w
        trans = trans * (1 - alpha)
        frag_w[p] = w.sum()
        frag_c[p] = ok.sum()
    return img, trans, frag_w, frag_c


def incidence_from_table(table, n):
    inc = np.zeros((n, TILES_TOTAL), bool)
    sp = np.asarray(table.sorted_point)
    st = np.asarray(table.sorted_tile)
    ev = np.asarray(table.entry_valid)
    inc[sp[ev], st[ev]] = True
    return inc


def test_raster_matches_naive_oracle():
    (mean, inv, color, op, z), table = build_scene(n=40, seed=1)
    out = raster_jnp.rasterize_reference(
        mean, inv, color, op, table.sorted_point, table.sorted_tile,
        table.entry_valid, table.tile_start, TILES_TOTAL, TILES_X,
        TILE_H, TILE_W)
    img = um.tiles_to_img(out.tiles_color, IMG_H, IMG_W, TILE_H, TILE_W)
    trans = um.tiles_to_img(out.tiles_trans[:, None], IMG_H, IMG_W,
                            TILE_H, TILE_W)[0]
    inc = incidence_from_table(table, 40)
    img_ref, trans_ref, fw_ref, fc_ref = naive_render(
        mean, inv, color, op, z, inc)
    np.testing.assert_allclose(img, img_ref, atol=2e-4)
    np.testing.assert_allclose(trans, trans_ref, atol=2e-4)
    np.testing.assert_allclose(out.frag_weight, fw_ref, atol=2e-3)
    np.testing.assert_array_equal(out.frag_count, fc_ref)


def test_raster_gradcheck():
    # single-tile scene keeps |f| small so finite differences are accurate
    rng0 = np.random.default_rng(2)
    n = 6
    mean, inv, color, op, z, ndc = random_screen_gaussians(
        rng0, n, TILE_H, TILE_W, scale_px=(1.5, 4.0))
    table = binning.build_tile_table(ndc, z, inv, op, jnp.ones(n, bool),
                                     TILE_H, TILE_W, TILE_H, TILE_W,
                                     512, 512)
    rng = np.random.default_rng(3)
    dloss = jnp.asarray(rng.standard_normal((1, 3, 128)), jnp.float32)

    def f(mean, inv, color, op):
        out = raster_jnp.rasterize_reference(
            mean, inv, color, op, table.sorted_point, table.sorted_tile,
            table.entry_valid, table.tile_start, 1, 1,
            TILE_H, TILE_W)
        return jnp.sum(out.tiles_color * dloss)

    args = (mean, inv, color, op)
    grads = jax.grad(f, argnums=(0, 1, 2, 3))(*args)
    eps = 1e-3
    rng2 = np.random.default_rng(4)
    # The blend has genuine step discontinuities (alpha floor 1/256,
    # raster.cu:266) where finite differences are meaningless; tolerate a
    # small number of threshold-straddling outliers.
    outliers, checked = 0, 0
    for argi, x in enumerate(args):
        flat = np.asarray(x, np.float64).ravel()
        g = np.asarray(grads[argi]).ravel()
        for i in rng2.choice(flat.size, size=5, replace=False):
            xp, xm = flat.copy(), flat.copy()
            xp[i] += eps
            xm[i] -= eps
            ap = [jnp.asarray(v) for v in args]
            am = [jnp.asarray(v) for v in args]
            ap[argi] = jnp.asarray(xp.reshape(x.shape), jnp.float32)
            am[argi] = jnp.asarray(xm.reshape(x.shape), jnp.float32)
            fd = (float(f(*ap)) - float(f(*am))) / (2 * eps)
            tol = 2e-2 + 0.05 * abs(fd)
            if abs(fd - g[i]) >= tol:
                outliers += 1
            checked += 1
    assert checked == 20
    assert outliers <= 3, f"{outliers}/20 gradient checks failed"


def test_empty_scene():
    n = 4
    mean = jnp.zeros((2, n))
    inv = jnp.stack([jnp.ones(n), jnp.zeros(n), jnp.ones(n)])
    color = jnp.ones((3, n))
    op = jnp.zeros(n)  # below 1/255 -> binning drops everything
    ndc = jnp.stack([jnp.zeros(n), jnp.zeros(n), jnp.full(n, .5),
                     jnp.ones(n)])
    z = jnp.ones(n)
    table = binning.build_tile_table(ndc, z, inv, op, jnp.ones(n, bool),
                                     IMG_H, IMG_W, TILE_H, TILE_W, 512, 512)
    assert int(table.num_entries) == 0
    out = raster_jnp.rasterize_reference(
        mean, inv, color, op, table.sorted_point, table.sorted_tile,
        table.entry_valid, table.tile_start, TILES_TOTAL, TILES_X,
        TILE_H, TILE_W)
    np.testing.assert_allclose(out.tiles_color, 0.0)
    np.testing.assert_allclose(out.tiles_trans, 1.0)
