"""Pure-jnp tile rasterizer (the 'reference path').

Fully vectorized alpha compositing over the flat (tile-sorted) entry axis:
the sequential front-to-back blend becomes a *segmented* exclusive
cumulative product of (1 - alpha), segmented by tile.  Differentiable end to
end via autodiff, so it serves as (a) the correctness oracle for the Pallas
kernels (the role of the reference's ``call_script`` paths,
litegs/utils/wrapper.py:21-164) and (b) a portable fallback backend that
runs on CPU.

Blend semantics match raster_forward_kernel (raster.cu:161-332):
  * alpha = opacity * exp(-0.5 q), q the inverse-covariance quadratic at
    the pixel center,
  * discard alpha < 1/256; clamp alpha to <= 255/256 (the clamp is
    straight-through for gradients, matching the CUDA backward which
    differentiates the unclamped product, raster.cu:776-778),
  * a pixel stops accepting contributions once its transmittance drops to
    <= 1/8192 (raster.cu:260),
  * outputs are unclamped here; the render wrapper clips to [0, 1]
    (render/__init__.py:87 does the same with autograd-visible clamp).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 256.0
ALPHA_MAX = 255.0 / 256.0
T_MIN = 1.0 / 8192.0


class RasterOutput(NamedTuple):
    tiles_color: jax.Array   # [T, C, P] accumulated (unclamped) channels
    tiles_trans: jax.Array   # [T, P] final transmittance
    frag_count: jax.Array    # [M] int32  fragments with valid alpha
    frag_weight: jax.Array   # [M] blend-weight sum per point


def tile_pixel_coords(tiles_x: int, tile_h: int, tile_w: int, tile_ids):
    """Continuous pixel coords of each tile's pixels.

    Returns (x [E, P], y [E, P]) for P = tile_h * tile_w pixels in row-major
    order within the tile (matches raster.cu:217-218 pixel indexing).
    """
    p = jnp.arange(tile_h * tile_w, dtype=jnp.int32)
    in_y = (p // tile_w)[None, :]
    in_x = (p % tile_w)[None, :]
    ty = (tile_ids // tiles_x)[:, None]
    tx = (tile_ids % tiles_x)[:, None]
    return ((tx * tile_w + in_x).astype(jnp.float32),
            (ty * tile_h + in_y).astype(jnp.float32))


def _segmented_exclusive_cumsum(x, seg_start_per_entry):
    """Exclusive cumsum of x [E, P] within segments of the sorted entry axis.

    seg_start_per_entry [E]: start offset of each entry's segment.
    """
    cum = jnp.cumsum(x, axis=0)
    excl = cum - x
    start = seg_start_per_entry
    base = jnp.where((start > 0)[:, None],
                     jnp.take(cum, jnp.maximum(start - 1, 0), axis=0), 0.0)
    return excl - base


def rasterize_reference(mean_pix, inv_cov, color, opacity,
                        sorted_point, sorted_tile, entry_valid, tile_start,
                        tiles_total: int, tiles_x: int,
                        tile_h: int, tile_w: int):
    """Rasterize into tile-layout images.

    Args:
      mean_pix: [2, M] gaussian centers in pixel coords.
      inv_cov:  [3, M] inverse 2D covariance (a, b, c).
      color:    [C, M] per-point channels (RGB, optionally + depth).
      opacity:  [M] activated opacity.
      sorted_point/sorted_tile/entry_valid/tile_start: binning table
        (see ops/binning.py); sorted_tile == tiles_total marks padding.
      tiles_total/tiles_x/tile_h/tile_w: static geometry.
    Returns RasterOutput (tile layout; utils.tiles_to_img converts).
    """
    nchan, m = color.shape
    e = sorted_point.shape[0]
    p = tile_h * tile_w

    safe_tile = jnp.minimum(sorted_tile, tiles_total - 1)
    pix_x, pix_y = tile_pixel_coords(tiles_x, tile_h, tile_w, safe_tile)

    def g(arr):
        return jnp.take(arr, sorted_point, axis=-1)

    dx = g(mean_pix[0])[:, None] - pix_x            # [E, P]
    dy = g(mean_pix[1])[:, None] - pix_y
    a = g(inv_cov[0])[:, None]
    b = g(inv_cov[1])[:, None]
    c = g(inv_cov[2])[:, None]
    power = -0.5 * (a * dx * dx + 2.0 * b * dx * dy + c * dy * dy)
    alpha_raw = g(opacity)[:, None] * jnp.exp(power)
    # straight-through upper clamp (see module docstring)
    alpha_c = alpha_raw + jax.lax.stop_gradient(
        jnp.minimum(alpha_raw, ALPHA_MAX) - alpha_raw)
    alpha_ok = (alpha_raw >= ALPHA_MIN) & entry_valid[:, None]
    alpha = jnp.where(alpha_ok, alpha_c, 0.0)

    seg_start = jnp.take(tile_start, safe_tile)

    # plain transmittance determines the stop condition (see raster.cu:260)
    log_t = jnp.log1p(-alpha)
    t_plain_excl = jnp.exp(_segmented_exclusive_cumsum(
        jax.lax.stop_gradient(log_t), seg_start))
    active = jax.lax.stop_gradient(t_plain_excl > T_MIN)

    alpha_eff = jnp.where(active, alpha, 0.0)
    log_t_eff = jnp.log1p(-alpha_eff)
    t_excl = jnp.exp(_segmented_exclusive_cumsum(log_t_eff, seg_start))
    weight = alpha_eff * t_excl                     # [E, P]

    col = jnp.take(color, sorted_point, axis=-1)    # [C, E]
    contrib = col[:, :, None] * weight[None]        # [C, E, P]
    tiles_color = jax.ops.segment_sum(
        contrib.transpose(1, 0, 2), safe_tile, num_segments=tiles_total)

    seg_logt = jax.ops.segment_sum(log_t_eff, safe_tile,
                                   num_segments=tiles_total)
    tiles_trans = jnp.exp(seg_logt)                 # [T, P]

    frag_ok = alpha_ok & active
    frag_count = jax.ops.segment_sum(
        jnp.sum(frag_ok, axis=-1, dtype=jnp.int32), sorted_point,
        num_segments=m)
    frag_weight = jax.ops.segment_sum(
        jnp.sum(jax.lax.stop_gradient(weight), axis=-1), sorted_point,
        num_segments=m)
    return RasterOutput(tiles_color=tiles_color, tiles_trans=tiles_trans,
                        frag_count=frag_count, frag_weight=frag_weight)
