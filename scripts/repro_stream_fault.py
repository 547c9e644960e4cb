"""Deterministic repro of the streaming-binning in-step TPU fault.

Run: BM_PROBE=1 BM_FRESH=1 BM_STEPS=3 python scripts/repro_stream_fault.py
Expected (bug present): steady step 0 succeeds, step 1 dies with a bare
INVALID_ARGUMENT.  The round-5 bisect (PERF.md r5 section 1) eliminated
donation, buffer provenance, operand values, window geometry, prefetch
lookahead, dynamic input index maps (explicit-DMA kernel variant), the
Pallas kernel itself (LITEGS_STREAM_FAKE replaces it with zeros), and a
barrier-fenced operand build -- the fault follows the compiled module,
not any code we control, and needs another executable's allocations to
have rearranged the heap first (run it WITHOUT BM_PROBE and all steps
pass).  Kept as the upstream-bug artifact; config.BINNING_STREAM stays
default-off until the toolchain moves.

Knobs: BM_PROBE=1 include probe phase; BM_STEPS=n steady steps;
BM_SIZEPROBE=1 include the size_probe jit; BM_FRESH=1 host round-trip
of state after the probe."""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ["LITEGS_BINNING_STREAM"] = "1"
os.environ.setdefault("LITEGS_STREAM_STAGES", "1")

import numpy as np
import jax
import jax.numpy as jnp


def main():
    from litegs_tpu import config as cfg
    from litegs_tpu.data import synthetic
    from litegs_tpu.scene import create_gaussians, pad_params
    from litegs_tpu.training import statistics
    from litegs_tpu.training.optimizer import init_adam
    from litegs_tpu.training.trainer import (TrainState,
                                             camera_batch_from_frames,
                                             make_train_step,
                                             masked_chunk_aabb)

    n_points, sh_degree = 1_000_000, 3
    img_h, img_w = 840, 1296
    n_frames = 1
    cam, frames = synthetic.make_cameras(n_frames, img_h, img_w, seed=0)
    xyz, rgb = synthetic.make_gaussian_cloud(n_points, seed=0)
    params = create_gaussians(xyz, rgb, sh_degree)
    params = params._replace(scale=params.scale - 0.7)
    params = pad_params(params, cfg.round_up(n_points, 128 * 128))
    caps0 = cfg.CapacityParams(
        primitive_capacity=params.capacity,
        visible_capacity=cfg.round_up(n_points, 128),
        row_capacity=cfg.round_up(n_points * 4, 128),
        entry_capacity=cfg.round_up(n_points * 8, 128))
    pp = cfg.PipelineParams(raster_backend="pallas", tile_size=(32, 24))
    lp = cfg.ModelParams(sh_degree=sh_degree)
    op_ = cfg.OptimizationParams()
    gt = np.random.default_rng(1).random(
        (n_frames, 3, img_h, img_w)).astype(np.float32)
    batch = camera_batch_from_frames(cam, frames, gt)
    state = TrainState(params=params, adam=init_adam(params),
                       active_count=jnp.int32(n_points), step=jnp.int32(0))
    stats = statistics.init_stats(caps0.primitive_capacity)
    origin, extend = masked_chunk_aabb(state.params, state.active_count,
                                       pp.cluster_size)

    if os.environ.get("BM_SIZEPROBE"):
        from litegs_tpu.render import estimate_view_sizes, render_preprocess

        @jax.jit
        def size_probe(params, planes, center, view, proj):
            culled = render_preprocess(params, origin, extend, planes,
                                       center, sh_degree, pp, caps0)
            return estimate_view_sizes(culled, view, proj, img_h, img_w, pp)

        s = size_probe(state.params, batch.planes[0], batch.center[0],
                       batch.view[0], batch.proj[0])
        sizes_max = np.asarray(s)
        print(f"[bm] size probe {sizes_max}", flush=True)
        caps_p = cfg.bucketed_capacity(caps0.primitive_capacity,
                                       *map(int, sizes_max))
    else:
        caps_p = cfg.CapacityParams(
            primitive_capacity=params.capacity,
            visible_capacity=1_015_808,
            row_capacity=2_437_888, entry_capacity=4_063_232)

    if os.environ.get("BM_PROBE"):
        probe_fn = make_train_step(lp, op_, pp, caps_p, img_h, img_w,
                                   spatial_lr_scale=1.0,
                                   sh_degree=sh_degree,
                                   collect_stats=False)
        state, stats, _, pm = probe_fn(state, stats, origin, extend,
                                       batch.view[0], batch.proj[0],
                                       batch.planes[0], batch.center[0],
                                       batch.images[0], None, jnp.int32(0))
        ts = np.asarray(pm["sizes"]) * [1.0, 1.05, 1.05]
        print(f"[bm] probe sizes {ts}", flush=True)
        if os.environ.get("BM_FRESH"):
            state = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                                 state)
            stats = jax.tree.map(lambda x: jnp.asarray(np.asarray(x)),
                                 stats)
            print("[bm] state round-tripped through host", flush=True)
        caps = cfg.bucketed_capacity(caps0.primitive_capacity,
                                     *map(int, ts), margin=1.05)
    else:
        caps = cfg.CapacityParams(
            primitive_capacity=params.capacity,
            visible_capacity=1_015_808,
            row_capacity=1_603_584, entry_capacity=2_347_776)
    print(f"[bm] steady caps vis={caps.visible_capacity} "
          f"rows={caps.row_capacity} ents={caps.entry_capacity}",
          flush=True)

    step = make_train_step(lp, op_, pp, caps, img_h, img_w,
                           spatial_lr_scale=1.0, sh_degree=sh_degree,
                           collect_stats=False)
    nsteps = int(os.environ.get("BM_STEPS", "1"))
    try:
        for i in range(nsteps):
            state, stats, _, m = step(state, stats, origin, extend,
                                      batch.view[0], batch.proj[0],
                                      batch.planes[0], batch.center[0],
                                      batch.images[0], None, jnp.int32(0))
            v = np.asarray(state.params.xyz.ravel()[0:1])[0]
            print(f"[ok] steady step {i}: loss={float(m['loss']):.4f} "
                  f"ov={bool(m['overflow'])} xyz0={v}", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] steady: {type(e).__name__}: {str(e)[:300]}",
              flush=True)


if __name__ == "__main__":
    main()
