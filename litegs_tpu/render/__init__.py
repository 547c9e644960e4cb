"""Render pipeline: cull -> compact -> activate -> project -> bin -> raster.

Functional, jit-stable port of the reference two-phase pipeline
(litegs/render/__init__.py:11-94).  Every stage is static-shaped: culling
compacts into a fixed visible capacity with a valid mask (the TPU analogue
of the reference's GPU-driven ``valid_length`` discipline,
compact.cu:527-551).
"""
from __future__ import annotations

import math
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import CapacityParams, PipelineParams
from ..ops import binning as binning_ops
from ..ops import projection
from ..ops import raster as raster_ops
from ..scene import cluster
from ..scene.gaussians import GaussianParams
from ..utils import math as um
from ..utils import sh as sh_utils


class CulledGaussians(NamedTuple):
    """Visible-compacted, activated gaussians (static capacity)."""

    xyz: jax.Array        # [3, Mv]
    scale: jax.Array      # [3, Mv] activated
    rot: jax.Array        # [4, Mv] unit quaternions
    color: jax.Array      # [3, Mv] view-dependent RGB
    opacity: jax.Array    # [Mv] activated
    valid: jax.Array      # [Mv] bool
    chunk_ids: jax.Array  # [Mv/chunk] gathered chunk ids
    num_visible_chunks: jax.Array  # scalar int32
    overflow: jax.Array   # scalar bool


class RenderAux(NamedTuple):
    """Intermediates kept for the statistics pass (densify epochs)."""

    table: binning_ops.BinningResult
    mean_pix: jax.Array
    inv_cov: jax.Array
    color_chan: jax.Array
    opacity: jax.Array
    tiles_color: jax.Array   # unclamped accumulation [T, C, P]
    tiles_trans: jax.Array   # [T, P]
    cache: object            # RasterCache (pallas backend) or None


class RenderedView(NamedTuple):
    img: jax.Array                  # [3, H, W] in [0, 1]
    transmitance: Optional[jax.Array]  # [1, H, W] or None
    depth: Optional[jax.Array]      # [1, H, W] or None
    primitive_visible: jax.Array    # [Mv] bool
    overflow: jax.Array             # scalar bool
    sizes: jax.Array                # [3] int32: visible prims, rows, entries
    aux: RenderAux


def render_preprocess(params: GaussianParams,
                      chunk_origin, chunk_extend,
                      frustumplane, cam_center,
                      actived_sh_degree: int,
                      pp: PipelineParams, caps: CapacityParams
                      ) -> CulledGaussians:
    """Frustum-cull chunks, gather visible ones, activate, evaluate SH.

    Mirrors reference render_preprocess (render/__init__.py:11-48) +
    cull_compact_activate (compact.cu:825-893).
    """
    chunk_size = pp.cluster_size
    vis_chunk_cap = caps.visible_capacity // chunk_size

    visibility = um.frustum_culling_aabb(frustumplane, chunk_origin,
                                         chunk_extend)
    if pp.disable_culling:
        # ablation: keep every active chunk (reference --cluster_size 0
        # path, ablations_culling.py:75); inactive (padding) chunks are
        # still dropped via their pushed-out AABBs' extend == 0 marker
        visibility = jnp.any(chunk_extend > 0.0, axis=0)
    chunk_ids, num_vis, overflow = cluster.visible_chunk_ids(
        visibility, vis_chunk_cap)
    valid = (jnp.arange(caps.visible_capacity) // chunk_size) < num_vis

    def gather(arr):
        return cluster.gather_chunks(arr, chunk_ids, chunk_size)

    xyz = gather(params.xyz)
    scale = jnp.exp(gather(params.scale))
    rot_raw = gather(params.rot)
    norm = jnp.sqrt(jnp.sum(rot_raw ** 2, axis=0, keepdims=True))
    rot = rot_raw / jnp.maximum(norm, 1e-12)
    # dirty-tail fill: zero opacity past the valid prefix (compact.cu:888)
    opacity = jnp.where(valid, jax.nn.sigmoid(gather(params.opacity)[0]), 0.0)

    # view-dependent color; directions are non-differentiable in the
    # reference (render/__init__.py:40-43 no_grad; SH dir-grad code is
    # commented out in transform.cu:1136-1290)
    dirs = jax.lax.stop_gradient(xyz) - cam_center[:, None]
    dirs = dirs / jnp.maximum(
        jnp.sqrt(jnp.sum(dirs ** 2, axis=0, keepdims=True)), 1e-12)
    # DC band and rest stay separate tensors end to end: concatenating
    # them costs ~3 ms/step in [16,3,N] relayout copies (sh_to_rgb_split)
    color = jnp.maximum(
        sh_utils.sh_to_rgb_split(actived_sh_degree, gather(params.sh_0),
                                 gather(params.sh_rest), dirs), 0.0)

    return CulledGaussians(xyz=xyz, scale=scale, rot=rot, color=color,
                           opacity=opacity, valid=valid, chunk_ids=chunk_ids,
                           num_visible_chunks=num_vis, overflow=overflow)


def estimate_view_sizes(culled: CulledGaussians, view_matrix, proj_matrix,
                        img_h: int, img_w: int, pp: PipelineParams):
    """Upper-bound (visible, rows, entries) for one view -- the initial
    capacity-bucket probe (cheap: projection + reductions, no expansions)."""
    tile_h, tile_w = pp.tile_size
    xyz_h = projection.homogeneous(culled.xyz)
    view_pos, ndc = projection.mvp_transform(xyz_h, view_matrix, proj_matrix)
    jac = projection.rayspace_jacobian(view_pos, proj_matrix, img_h, img_w)
    cov2d = projection.cov2d_fused(culled.scale, culled.rot, jac,
                                   view_matrix)
    inv_cov = projection.inverse_2x2_sym(cov2d)
    return binning_ops.estimate_table_sizes(
        ndc, view_pos[2], inv_cov, culled.opacity, culled.valid,
        img_h, img_w, tile_h, tile_w)


def render(culled: CulledGaussians, view_matrix, proj_matrix,
           img_h: int, img_w: int,
           pp: PipelineParams, caps: CapacityParams,
           interpret: bool = False, stats_sink=None) -> RenderedView:
    """Project visible gaussians and rasterize one view.

    Mirrors reference render (render/__init__.py:50-94): MVP -> transform
    matrix -> ray-space Jacobian -> cov2d -> inverse -> binning -> raster.

    ``stats_sink``: optional zero RasterStats gradient-sink (see
    ops/raster.rasterize) -- on statistics epochs the trainer passes it
    and reads the densification statistics off the sink's loss gradient,
    sharing the backward kernel + reduce with the parameter VJP.
    """
    tile_h, tile_w = pp.tile_size
    tiles_x = math.ceil(img_w / tile_w)
    tiles_y = math.ceil(img_h / tile_h)
    tiles_total = tiles_x * tiles_y

    xyz_h = projection.homogeneous(culled.xyz)
    view_pos, ndc = projection.mvp_transform(xyz_h, view_matrix, proj_matrix)
    jac = projection.rayspace_jacobian(view_pos, proj_matrix, img_h, img_w)
    cov2d = projection.cov2d_fused(culled.scale, culled.rot, jac,
                                   view_matrix)
    inv_cov = projection.inverse_2x2_sym(cov2d)
    view_z = view_pos[2]

    table = binning_ops.build_tile_table(
        jax.lax.stop_gradient(ndc), jax.lax.stop_gradient(view_z),
        jax.lax.stop_gradient(inv_cov), jax.lax.stop_gradient(culled.opacity),
        culled.valid, img_h, img_w, tile_h, tile_w,
        caps.row_capacity, caps.entry_capacity)

    mean_pix = projection.ndc_to_pixel(ndc, img_h, img_w)
    channels = [culled.color]
    if pp.enable_depth:
        channels.append(view_z[None])
    color_chan = jnp.concatenate(channels, axis=0)

    tiles_color, tiles_trans, cache = raster_ops.rasterize(
        mean_pix, inv_cov, color_chan, culled.opacity, table,
        tiles_total, tiles_x, tile_h, tile_w,
        backend=pp.raster_backend, interpret=interpret,
        stats_sink=stats_sink, img_h=img_h, img_w=img_w)

    img_all = um.tiles_to_img(tiles_color, img_h, img_w, tile_h, tile_w)
    img = jnp.clip(img_all[:3], 0.0, 1.0)
    depth = img_all[3:4] if pp.enable_depth else None
    trans = None
    if pp.enable_transmitance:
        trans = um.tiles_to_img(tiles_trans[:, None], img_h, img_w,
                                tile_h, tile_w)

    aux = RenderAux(table=table, mean_pix=mean_pix, inv_cov=inv_cov,
                    color_chan=color_chan, opacity=culled.opacity,
                    tiles_color=tiles_color, tiles_trans=tiles_trans,
                    cache=cache)
    # actual sizes this view consumed -- the feedback signal for capacity
    # bucketing (the reference's pinned-memory feedback buffers,
    # data.py:236-245; here a device vector read lazily by the trainer)
    sizes = jnp.stack([
        culled.num_visible_chunks.astype(jnp.int32) * jnp.int32(
            pp.cluster_size),
        table.num_rows.astype(jnp.int32),
        # alignment pads live outside entry_capacity since the pad-sort
        # rewrite, so the bucket feedback tracks raw entries only
        table.num_entries.astype(jnp.int32)])
    return RenderedView(img=img, transmitance=trans, depth=depth,
                        primitive_visible=table.primitive_visible,
                        overflow=table.overflow | culled.overflow,
                        sizes=sizes, aux=aux)


class RenderedBatch(NamedTuple):
    """B views rendered by ONE raster kernel launch (see render_batch)."""

    imgs: jax.Array                    # [B, 3, H, W] in [0, 1]
    transmitance: Optional[jax.Array]  # [B, 1, H, W] or None
    depth: Optional[jax.Array]         # [B, 1, H, W] or None
    primitive_visible: jax.Array       # [B, Mv] bool
    overflow: jax.Array                # scalar bool (any view)
    sizes: jax.Array                   # [B, 3] int32 per view


def render_batch(culled_list, view_mats, proj_mats,
                 img_h: int, img_w: int,
                 pp: PipelineParams, caps: CapacityParams,
                 interpret: bool = False, stats_sink=None) -> RenderedBatch:
    """Render B views through ONE rasterize() call.

    The reference plumbs a batch axis B through every raster kernel
    (raster.cu:182); here the per-view tables merge into one B*T-tile
    table (binning.concat_tables) so one kernel launch, one entry pack
    and one backward reduce serve all B views -- amortizing the fixed
    per-dispatch costs that dominate small per-view ops.  Per-view
    projection/binning stay independent (same math as render()); the
    merged per-point gradients [*, B*Mv] split back through each view's
    chain automatically.

    All views share one (img_h, img_w) and one capacity bundle; overflow
    of ANY view poisons the batch (the step retries, the same discipline
    as single-view).  Pallas backend only.
    """
    assert pp.raster_backend == "pallas", "render_batch is pallas-only"
    b = len(culled_list)
    tile_h, tile_w = pp.tile_size
    tiles_x = math.ceil(img_w / tile_w)
    tiles_y = math.ceil(img_h / tile_h)
    tiles_total = tiles_x * tiles_y
    mv = caps.visible_capacity

    tables, mean_pixs, inv_covs, colors, opacities = [], [], [], [], []
    sizes = []
    for v in range(b):
        culled = culled_list[v]
        xyz_h = projection.homogeneous(culled.xyz)
        view_pos, ndc = projection.mvp_transform(xyz_h, view_mats[v],
                                                 proj_mats[v])
        jac = projection.rayspace_jacobian(view_pos, proj_mats[v],
                                           img_h, img_w)
        cov2d = projection.cov2d_fused(culled.scale, culled.rot, jac,
                                       view_mats[v])
        inv_cov = projection.inverse_2x2_sym(cov2d)
        view_z = view_pos[2]
        table = binning_ops.build_tile_table(
            jax.lax.stop_gradient(ndc), jax.lax.stop_gradient(view_z),
            jax.lax.stop_gradient(inv_cov),
            jax.lax.stop_gradient(culled.opacity),
            culled.valid, img_h, img_w, tile_h, tile_w,
            caps.row_capacity, caps.entry_capacity)
        tables.append(table)
        mean_pixs.append(projection.ndc_to_pixel(ndc, img_h, img_w))
        channels = [culled.color]
        if pp.enable_depth:
            channels.append(view_z[None])
        colors.append(jnp.concatenate(channels, axis=0))
        opacities.append(culled.opacity)
        inv_covs.append(inv_cov)
        sizes.append(jnp.stack([
            culled.num_visible_chunks.astype(jnp.int32)
            * jnp.int32(pp.cluster_size),
            table.num_rows.astype(jnp.int32),
            table.num_entries.astype(jnp.int32)]))

    merged = binning_ops.concat_tables(tables, tiles_total, mv)
    tiles_color, tiles_trans, _ = raster_ops.rasterize(
        jnp.concatenate(mean_pixs, axis=1),
        jnp.concatenate(inv_covs, axis=1),
        jnp.concatenate(colors, axis=1),
        jnp.concatenate(opacities, axis=0),
        merged, b * tiles_total, tiles_x, tile_h, tile_w,
        backend="pallas", interpret=interpret,
        stats_sink=stats_sink,  # [B*Mv] sink: per-view stats by slicing
        img_h=img_h, img_w=img_w, tiles_y=tiles_y)

    imgs, transs, depths = [], [], []
    for v in range(b):
        tc = tiles_color[v * tiles_total:(v + 1) * tiles_total]
        img_all = um.tiles_to_img(tc, img_h, img_w, tile_h, tile_w)
        imgs.append(jnp.clip(img_all[:3], 0.0, 1.0))
        if pp.enable_depth:
            depths.append(img_all[3:4])
        if pp.enable_transmitance:
            tt = tiles_trans[v * tiles_total:(v + 1) * tiles_total]
            transs.append(um.tiles_to_img(tt[:, None], img_h, img_w,
                                          tile_h, tile_w))
    overflow = merged.overflow | jnp.any(
        jnp.stack([c.overflow for c in culled_list]))
    return RenderedBatch(
        imgs=jnp.stack(imgs),
        transmitance=jnp.stack(transs) if transs else None,
        depth=jnp.stack(depths) if depths else None,
        primitive_visible=merged.primitive_visible.reshape(b, mv),
        overflow=overflow, sizes=jnp.stack(sizes))
