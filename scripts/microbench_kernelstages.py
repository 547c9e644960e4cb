#!/usr/bin/env python
"""On-chip pass-count attribution for the rasterizer kernels.

Times the forward/backward Pallas kernels with individual blend stages
STUBBED (the `ablate` static arg threaded through ops/raster_pallas;
outputs are intentionally wrong) so the difference to the full kernel
attributes wall time to each stage.  This decides where pass-count work
pays: the kernels run at VPU roofline (PERF.md r3), so only removing
passes moves them.

Stage chars (upper-case = ablate):
  Q alpha quadratic   E exp        C transmittance cumprod
  A fwd accumulate    T fwd T bookkeeping
  S bwd suffix cumsum G bwd g1     M bwd moments    D bwd d_color

Run (one TPU process at a time!):
  python scripts/microbench_kernelstages.py
  MXU_POINTS=200000 python scripts/microbench_kernelstages.py  # quick
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def _sync(x):
    import jax
    return np.asarray(jax.device_get(x.ravel()[0:1]))


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    n_points = int(os.environ.get("MXU_POINTS",
                                  1_000_000 if on_tpu else 20_000))
    img_h = int(os.environ.get("MXU_H", 840 if on_tpu else 128))
    img_w = int(os.environ.get("MXU_W", 1296 if on_tpu else 256))
    reps = int(os.environ.get("MXU_REPS", 20 if on_tpu else 2))
    th, tw = map(int, os.environ.get("MXU_TILE", "32x24").split("x"))
    interp = not on_tpu

    from litegs_tpu import config as cfg
    from litegs_tpu.data import synthetic
    from litegs_tpu.ops import binning as binning_ops
    from litegs_tpu.ops import projection
    from litegs_tpu.ops import raster as raster_ops
    from litegs_tpu.ops import raster_pallas as rp
    from litegs_tpu.render import render_preprocess
    from litegs_tpu.scene import create_gaussians, pad_params
    from litegs_tpu.training.trainer import (camera_batch_from_frames,
                                             masked_chunk_aabb)
    import math as pymath

    sh_degree = 3
    cam, frames = synthetic.make_cameras(1, img_h, img_w, seed=0)
    xyz, rgb = synthetic.make_gaussian_cloud(n_points, seed=0)
    params = create_gaussians(xyz, rgb, sh_degree)
    params = params._replace(scale=params.scale - 0.7)
    params = pad_params(params, cfg.round_up(n_points, 128 * 128))
    caps = cfg.CapacityParams(
        primitive_capacity=params.capacity,
        visible_capacity=cfg.round_up(n_points, 128),
        row_capacity=cfg.round_up(n_points * 4, 128),
        entry_capacity=cfg.round_up(n_points * 8, 128))
    pp = cfg.PipelineParams(tile_size=(th, tw))
    gt = np.random.default_rng(1).random((1, 3, img_h, img_w)).astype(
        np.float32)
    batch = camera_batch_from_frames(cam, frames, gt)
    origin, extend = masked_chunk_aabb(params, jnp.int32(n_points),
                                       pp.cluster_size)

    tiles_x = pymath.ceil(img_w / tw)
    tiles_total = pymath.ceil(img_h / th) * tiles_x

    @jax.jit
    def build(params):
        culled = render_preprocess(params, origin, extend, batch.planes[0],
                                   batch.center[0], sh_degree, pp, caps)
        xyz_h = projection.homogeneous(culled.xyz)
        view_pos, ndc = projection.mvp_transform(xyz_h, batch.view[0],
                                                 batch.proj[0])
        jac = projection.rayspace_jacobian(view_pos, batch.proj[0],
                                           img_h, img_w)
        cov2d = projection.cov2d_fused(culled.scale, culled.rot, jac,
                                       batch.view[0])
        inv_cov = projection.inverse_2x2_sym(cov2d)
        table = binning_ops.build_tile_table(
            ndc, view_pos[2], inv_cov, culled.opacity, culled.valid,
            img_h, img_w, th, tw, caps.row_capacity, caps.entry_capacity)
        mean_pix = projection.ndc_to_pixel(ndc, img_h, img_w)
        color4 = jnp.pad(culled.color, ((0, 1), (0, 0)))
        cache = raster_ops.build_cache(mean_pix, inv_cov, color4,
                                       culled.opacity, table, tiles_total,
                                       tiles_x, th, tw, has_depth=False)
        return cache, table

    cache, table = build(params)
    _sync(cache.packed.params)
    print(f"workload: {n_points} pts, {img_h}x{img_w}, tiles {th}x{tw}, "
          f"entries {int(table.num_entries)}, blocks "
          f"{int(cache.block_tile.shape[0])}", file=sys.stderr)

    fwd0 = rp.raster_forward_pallas(cache.packed.params, cache.block_tile,
                                    cache.block_cnt, tiles_total, th, tw,
                                    interpret=interp, has_depth=False)
    rng = np.random.default_rng(2)
    d_col = jnp.asarray(rng.standard_normal(
        (tiles_total, 4, th * tw)), jnp.float32) * 1e-3
    d_col = d_col.at[:, 3].set(0.0)
    d_trans = jnp.zeros((tiles_total, th * tw), jnp.float32)
    acc = fwd0[:tiles_total, 0:4, :]
    t_fin = fwd0[:tiles_total, 4, :]
    d0 = jnp.sum(d_col * acc, axis=1) + t_fin * d_trans
    dtiles = jnp.concatenate(
        [d_col, d_trans[:, None, :], d0[:, None, :],
         jnp.zeros((tiles_total, 2, th * tw), jnp.float32)], axis=1)
    dtiles = jnp.pad(dtiles, ((0, 1), (0, 0), (0, 0)))

    def time_fn(f, *args):
        out = f(*args)
        _sync(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = f(*args)
        _sync(out)
        return (time.perf_counter() - t0) / reps * 1e3

    fwd_abls = os.environ.get("KS_FWD", ",Q,E,C,A,T,QECAT").split(",")
    print("\nforward kernel (default mxu mode "
          f"'{rp.MXU_MODE}'):", file=sys.stderr)
    base = None
    for ab in fwd_abls:
        ms = time_fn(
            lambda p, bt, bc, _a=ab: rp.raster_forward_pallas(
                p, bt, bc, tiles_total, th, tw, interpret=interp,
                has_depth=False, ablate=_a),
            cache.packed.params, cache.block_tile, cache.block_cnt)
        if base is None:
            base = ms
            print(f"  full     {ms:7.2f} ms", file=sys.stderr)
        else:
            print(f"  -{ab:7s} {ms:7.2f} ms  (stage ~{base - ms:+.2f})",
                  file=sys.stderr)

    bwd_abls = os.environ.get(
        "KS_BWD", ",Q,E,C,S,G,M,D,QECSGMD").split(",")
    print("\nbackward kernel (with_stats=False):", file=sys.stderr)
    base = None
    for ab in bwd_abls:
        ms = time_fn(
            lambda p, dt, bt, bc, _a=ab: rp.raster_backward_pallas(
                p, dt, bt, bc, tiles_total, th, tw, interpret=interp,
                has_depth=False, with_stats=False, ablate=_a),
            cache.packed.params, dtiles, cache.block_tile, cache.block_cnt)
        if base is None:
            base = ms
            print(f"  full     {ms:7.2f} ms", file=sys.stderr)
        else:
            print(f"  -{ab:7s} {ms:7.2f} ms  (stage ~{base - ms:+.2f})",
                  file=sys.stderr)


if __name__ == "__main__":
    main()
