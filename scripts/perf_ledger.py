"""Per-stage timing ledger for the train step on real hardware.

Times each pipeline stage separately (jitted, forced readbacks per the
axon-tunnel timing rules) at bench.py's workload shape, and prints a
table attributing the full step time.  Committed output: PERF.md.

Usage:  python scripts/perf_ledger.py   (TPU; ~2 min)
Env: LEDGER_POINTS/H/W/ITERS/TILE like bench.py.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def readback(x):
    """Force device sync via a 4-BYTE transfer (slicing on device first).

    np.asarray(full_output) would drag the whole buffer through the slow
    axon tunnel and dominate the measurement; a 1-element device-side
    slice syncs the stream without the transfer."""
    import jax
    leaf = [l for l in jax.tree_util.tree_leaves(x)
            if hasattr(l, "ravel")][0]
    return np.asarray(leaf.ravel()[0:1])[0]


def bench(name, fn, *args, iters=8):
    import jax
    f = jax.jit(fn)
    out = f(*args)
    readback(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    readback(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(json.dumps({"stage": name, "ms": round(dt, 2)}), flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp

    on_tpu = jax.default_backend() == "tpu"
    n_points = int(os.environ.get("LEDGER_POINTS",
                                  1_000_000 if on_tpu else 20_000))
    img_h = int(os.environ.get("LEDGER_H", 840 if on_tpu else 128))
    img_w = int(os.environ.get("LEDGER_W", 1296 if on_tpu else 256))

    from litegs_tpu import config as cfg
    from litegs_tpu.data import synthetic
    from litegs_tpu.ops import binning as binning_ops
    from litegs_tpu.ops import losses, projection
    from litegs_tpu.ops import raster as raster_ops
    from litegs_tpu.ops import raster_pallas
    from litegs_tpu.render import render_preprocess, render, \
        estimate_view_sizes
    from litegs_tpu.scene import create_gaussians, pad_params
    from litegs_tpu.training import statistics
    from litegs_tpu.training.optimizer import (LearningRates, init_adam,
                                               sparse_adam_step)
    from litegs_tpu.scene import cluster
    from litegs_tpu.training.trainer import (TrainState,
                                             camera_batch_from_frames,
                                             make_train_step,
                                             masked_chunk_aabb)

    sh_degree = 3
    cam, frames = synthetic.make_cameras(2, img_h, img_w, seed=0)
    xyz, rgb = synthetic.make_gaussian_cloud(n_points, seed=0)
    params = create_gaussians(xyz, rgb, sh_degree)
    params = params._replace(scale=params.scale - 0.7)
    params = pad_params(params, cfg.round_up(n_points, 128 * 128))
    caps = cfg.CapacityParams(
        primitive_capacity=params.capacity,
        visible_capacity=cfg.round_up(n_points, 128),
        row_capacity=cfg.round_up(n_points * 4, 128),
        entry_capacity=cfg.round_up(n_points * 8, 128))
    th, tw = map(int, os.environ.get("LEDGER_TILE", "32x32").split("x"))
    pp = cfg.PipelineParams(raster_backend="pallas" if on_tpu else "jnp",
                            tile_size=(th, tw))
    lp = cfg.ModelParams(sh_degree=sh_degree)
    op_ = cfg.OptimizationParams()
    import math as pymath
    tiles_x = pymath.ceil(img_w / tw)
    tiles_total = pymath.ceil(img_h / th) * tiles_x

    gt = np.random.default_rng(1).random((2, 3, img_h, img_w)).astype(
        np.float32)
    batch = camera_batch_from_frames(cam, frames, gt)
    state = TrainState(params=params, adam=init_adam(params),
                       active_count=jnp.int32(n_points),
                       step=jnp.int32(0))
    stats = statistics.init_stats(caps.primitive_capacity)
    origin, extend = masked_chunk_aabb(state.params, state.active_count,
                                       pp.cluster_size)

    # size-probe -> right capacity bucket (as bench.py)
    @jax.jit
    def size_probe(params, planes, center, view, proj):
        culled = render_preprocess(params, origin, extend, planes, center,
                                   sh_degree, pp, caps)
        return estimate_view_sizes(culled, view, proj, img_h, img_w, pp)

    s = np.asarray(size_probe(state.params, batch.planes[0],
                              batch.center[0], batch.view[0],
                              batch.proj[0]))
    caps = cfg.bucketed_capacity(caps.primitive_capacity, *map(int, s))
    interp = not on_tpu
    probe_fn = make_train_step(lp, op_, pp, caps, img_h, img_w, 1.0,
                               sh_degree, False, interp)
    # the step donates (state, stats) -- probe on copies
    state_c = jax.tree.map(jnp.array, state)
    stats_c = jax.tree.map(jnp.array, stats)
    state2, _, _, pm = probe_fn(state_c, stats_c, origin, extend,
                                batch.view[0], batch.proj[0],
                                batch.planes[0], batch.center[0],
                                batch.images[0], None, jnp.int32(0))
    true_sizes = np.asarray(pm["sizes"]) * [1.0, 1.1, 1.1]
    caps = cfg.bucketed_capacity(caps.primitive_capacity,
                                 *map(int, true_sizes))
    print(f"[ledger] caps vis={caps.visible_capacity} "
          f"rows={caps.row_capacity} entries={caps.entry_capacity}",
          file=sys.stderr)
    del state2

    view, proj = batch.view[0], batch.proj[0]
    planes, center = batch.planes[0], batch.center[0]
    gt0 = batch.images[0]

    # ---- stage inputs (computed once) ----
    @jax.jit
    def stage_preprocess(params):
        return render_preprocess(params, origin, extend, planes, center,
                                 sh_degree, pp, caps)

    culled = stage_preprocess(state.params)

    @jax.jit
    def stage_project(culled):
        xyz_h = projection.homogeneous(culled.xyz)
        view_pos, ndc = projection.mvp_transform(xyz_h, view, proj)
        tm = projection.create_transform_matrix(culled.scale, culled.rot)
        jac = projection.rayspace_jacobian(view_pos, proj, img_h, img_w)
        cov2d = projection.cov2d_from_transform(jac, view, tm)
        inv_cov = projection.inverse_2x2_sym(cov2d)
        return view_pos, ndc, inv_cov

    view_pos, ndc, inv_cov = stage_project(culled)

    def stage_binning(ndc, view_z, inv_cov, opacity, valid):
        return binning_ops.build_tile_table(
            ndc, view_z, inv_cov, opacity, valid, img_h, img_w, th, tw,
            caps.row_capacity, caps.entry_capacity)

    table = jax.jit(stage_binning)(ndc, view_pos[2], inv_cov,
                                   culled.opacity, culled.valid)

    mean_pix = projection.ndc_to_pixel(ndc, img_h, img_w)
    color4 = jnp.pad(culled.color, ((0, 1), (0, 0)))

    # big arrays ride as ARGUMENTS, not closures: closed-over device
    # arrays are baked into the compile payload and the axon tunnel
    # rejects >~100MB programs (HTTP 413)
    def stage_pack(mean_pix, inv_cov, color4, opacity, table):
        return raster_ops.build_cache(mean_pix, inv_cov, color4, opacity,
                                      table, tiles_total, tiles_x, th, tw,
                                      has_depth=False)

    cache = jax.jit(stage_pack)(mean_pix, inv_cov, color4, culled.opacity,
                                table)

    def stage_fwd(params_packed, bt, bc):
        return raster_pallas.raster_forward_pallas(
            params_packed, bt, bc, tiles_total, th, tw, interpret=interp)

    out_raw = jax.jit(stage_fwd)(cache.packed.params, cache.block_tile,
                                 cache.block_cnt)
    out_tiles = out_raw[:tiles_total]
    dtiles = jnp.pad(out_raw, ((0, 1), (0, 0), (0, 0)))

    def stage_bwd_kernel(params_packed, dtiles, bt, bc):
        return raster_pallas.raster_backward_pallas(
            params_packed, dtiles, bt, bc, tiles_total, th, tw,
            interpret=interp)

    grads16 = jax.jit(stage_bwd_kernel)(cache.packed.params, dtiles,
                                        cache.block_tile, cache.block_cnt)

    e = table.sorted_point.shape[0]

    def stage_reduce(grads16, p, mu_local, entry_valid, sorted_point):
        g16 = jnp.where(entry_valid[None, :], grads16[:, :e], 0.0)
        conv = raster_pallas.moments_to_grads(
            g16, mu_local, p[12:15, :e], p[15, :e])
        rows = jnp.concatenate(
            [conv["d_color"], conv["d_invcov"], conv["d_mean"],
             conv["d_opacity"][None]], axis=0)
        return jnp.stack([
            jax.ops.segment_sum(rows[i], sorted_point,
                                num_segments=mean_pix.shape[1])
            for i in range(10)])

    def stage_loss_grad(img, gt):
        return jax.grad(lambda im: losses.fused_l1_ssim_loss(
            im, gt, op_.lambda_dssim))(img)

    from litegs_tpu.utils import math as um
    img = jnp.clip(um.tiles_to_img(out_tiles[:, 0:3, :], img_h, img_w,
                                   th, tw), 0.0, 1.0)

    nchunks = caps.primitive_capacity // pp.cluster_size
    chunk_mask = cluster.scatter_chunk_mask(
        culled.chunk_ids, culled.num_visible_chunks, nchunks)
    lrs = LearningRates.from_config(op_, 1.0, state.step)
    grads = jax.tree.map(jnp.ones_like, state.params)

    def stage_adam(params, grads, adam):
        return sparse_adam_step(params, grads, adam, lrs, chunk_mask,
                                pp.cluster_size)

    step_fn = make_train_step(lp, op_, pp, caps, img_h, img_w, 1.0,
                              sh_degree, False, interp)

    def _touch_all(s2, st2, mm):
        # depend on EVERY output leaf: returning only the loss lets the
        # outer jit DCE the whole backward+Adam (loss is forward-only),
        # which silently turned this row into a fwd+loss measurement
        leaves = jax.tree.leaves((s2, st2))
        return mm["loss"], [l.ravel()[:1] for l in leaves]

    def stage_full(state, stats):
        s2, st2, _, mm = step_fn(state, stats, origin, extend, view, proj,
                                 planes, center, gt0, None, jnp.int32(0))
        return _touch_all(s2, st2, mm)

    def stage_full_stats(state, stats):
        s2, st2, _, mm = step_fn_stats(state, stats, origin, extend, view,
                                       proj, planes, center, gt0, None,
                                       jnp.int32(0))
        return _touch_all(s2, st2, mm)

    step_fn_stats = make_train_step(lp, op_, pp, caps, img_h, img_w, 1.0,
                                    sh_degree, True, interp)

    total = {}
    total["preprocess"] = bench("preprocess(cull+act+sh)", stage_preprocess,
                                state.params)
    total["project"] = bench("project(chain fwd)", stage_project, culled)
    total["binning"] = bench("binning(build_tile_table)", stage_binning,
                             ndc, view_pos[2], inv_cov, culled.opacity,
                             culled.valid)
    total["pack"] = bench("pack(build_cache)", stage_pack, mean_pix,
                          inv_cov, color4, culled.opacity, table)
    total["fwd_kernel"] = bench("raster fwd kernel", stage_fwd,
                                cache.packed.params, cache.block_tile,
                                cache.block_cnt)
    total["bwd_kernel"] = bench("raster bwd kernel", stage_bwd_kernel,
                                cache.packed.params, dtiles,
                                cache.block_tile, cache.block_cnt)
    total["reduce"] = bench("bwd segment reduce", stage_reduce, grads16,
                            cache.packed.params, cache.packed.mu_local,
                            table.entry_valid, table.sorted_point)
    total["loss_grad"] = bench("ssim+l1 loss grad", stage_loss_grad, img,
                               gt0)
    total["adam"] = bench("sparse adam", stage_adam, state.params, grads,
                          state.adam)
    t_full = bench("FULL train step", stage_full, state, stats, iters=6)
    t_stats = bench("FULL step (stats epoch)", stage_full_stats, state,
                    stats, iters=4)

    acc = sum(total.values())
    print(json.dumps({"stage": "sum_of_stages", "ms": round(acc, 2),
                      "full_ms": round(t_full, 2),
                      "stats_full_ms": round(t_stats, 2),
                      "attributed_pct": round(100 * acc / t_full, 1)}),
          flush=True)


if __name__ == "__main__":
    main()
