#!/usr/bin/env python
"""On-chip study: which rasterizer blend stages win on the MXU.

Builds ONE realistic bench-scale workload (same synthetic scene as
bench.py), packs the entry table once, then times the forward and backward
Pallas kernels across MXU offload modes (see ops/raster_pallas.MXU_MODE for
the stage chars) and reports per-mode kernel time plus the max deviation of
the outputs from the all-VPU f32 reference mode.

Decision rule: a stage char goes into config.RASTER_MXU_MODE iff it is
faster AND its deviation stays well under the on-chip parity bars
(scripts/tpu_parity_check.py uses 1e-4-class thresholds).

Run (one TPU process at a time!):
  python scripts/microbench_mxu.py                 # full sweep
  MXU_POINTS=200000 python scripts/microbench_mxu.py   # quick
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
    tiles_y = pymath.ceil(img_h / th)
    tiles_total = tiles_x * tiles_y

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
    e_cap = int(table.sorted_point.shape[0])
    n_ent = int(table.num_entries)
    print(f"workload: {n_points} pts, {img_h}x{img_w}, tiles {th}x{tw}, "
          f"entries {n_ent} (cap {e_cap}), blocks "
          f"{int(cache.block_tile.shape[0])}", file=sys.stderr)

    # upstream cotangent tiles: forward once + random image grad
    fwd0 = rp.raster_forward_pallas(cache.packed.params, cache.block_tile,
                                    cache.block_cnt, tiles_total, th, tw,
                                    interpret=interp, has_depth=False,
                                    mxu="")
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
        return (time.perf_counter() - t0) / reps * 1e3, out

    def dev(a, b):
        d = np.abs(np.asarray(jax.device_get(a - b)))
        return float(np.max(d))

    # ---- forward sweep ----
    fwd_modes = os.environ.get(
        "MXU_FWD_MODES", ",q,c,a,qc,qa,ca,qca").split(",")
    base_fwd = None
    print("\nforward kernel:", file=sys.stderr)
    for mode in fwd_modes:
        def f(p, bt, bc, _m=mode):
            return rp.raster_forward_pallas(p, bt, bc, tiles_total, th, tw,
                                            interpret=interp,
                                            has_depth=False, mxu=_m)
        ms, out = time_fn(f, cache.packed.params, cache.block_tile,
                          cache.block_cnt)
        # compare only the color+T rows of real tiles
        cmp = out[:tiles_total, 0:5, :]
        cmp = jnp.where((table.tile_count > 0)[:, None, None], cmp, 0.0)
        if base_fwd is None:
            base_fwd = cmp
            print(f"  mode {mode or '(vpu)':8s} {ms:7.2f} ms  (reference)",
                  file=sys.stderr)
        else:
            print(f"  mode {mode or '(vpu)':8s} {ms:7.2f} ms  "
                  f"maxdev {dev(cmp, base_fwd):.3e}", file=sys.stderr)

    # ---- backward sweep ----
    bwd_modes = os.environ.get(
        "MXU_BWD_MODES", ",q,c,s,g,d,m,qc,qcs,qcsg,qcsgd,qcsgdm").split(",")
    base_bwd = None
    print("\nbackward kernel (with_stats=False):", file=sys.stderr)
    ev = table.entry_valid
    for mode in bwd_modes:
        def f(p, dt, bt, bc, _m=mode):
            return rp.raster_backward_pallas(p, dt, bt, bc, tiles_total,
                                             th, tw, interpret=interp,
                                             has_depth=False,
                                             with_stats=False, mxu=_m)
        ms, out = time_fn(f, cache.packed.params, dtiles, cache.block_tile,
                          cache.block_cnt)
        cmp = jnp.where(ev[None, :], out[:, :e_cap], 0.0)
        if base_bwd is None:
            base_bwd = cmp
            scale = float(jnp.max(jnp.abs(cmp)))
            print(f"  mode {mode or '(vpu)':8s} {ms:7.2f} ms  (reference, "
                  f"max|g|={scale:.3e})", file=sys.stderr)
        else:
            print(f"  mode {mode or '(vpu)':8s} {ms:7.2f} ms  "
                  f"maxdev {dev(cmp, base_bwd):.3e}", file=sys.stderr)

    # with_stats backward at the winning mode for the stats-epoch cost
    print("\nbackward kernel (with_stats=True):", file=sys.stderr)
    for mode in os.environ.get("MXU_STATS_MODES", ",qcsgdm").split(","):
        def f(p, dt, bt, bc, _m=mode):
            return rp.raster_backward_pallas(p, dt, bt, bc, tiles_total,
                                             th, tw, interpret=interp,
                                             has_depth=False,
                                             with_stats=True, mxu=_m)
        ms, out = time_fn(f, cache.packed.params, dtiles, cache.block_tile,
                          cache.block_cnt)
        print(f"  mode {mode or '(vpu)':8s} {ms:7.2f} ms", file=sys.stderr)


if __name__ == "__main__":
    main()
