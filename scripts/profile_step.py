"""HLO-level attribution of the REAL fused train step on the TPU.

Stage-wise timing (perf_ledger.py) over-counts: stage boundaries force
materializations that the fused step graph avoids.  This captures a
jax.profiler trace of steady-state steps and aggregates per-HLO-op time
via tensorboard_plugin_profile, answering "where does the fused step
actually spend time".

    python scripts/profile_step.py          (TPU, ~4 min)
Env: PROF_TILE (default 32x32), PROF_STEPS (default 4).
"""
from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def build_step():
    import jax
    import jax.numpy as jnp
    from litegs_tpu import config as cfg
    from litegs_tpu.data import synthetic
    from litegs_tpu.render import render_preprocess, estimate_view_sizes
    from litegs_tpu.scene import create_gaussians, pad_params
    from litegs_tpu.training import statistics
    from litegs_tpu.training.optimizer import init_adam
    from litegs_tpu.training.trainer import (TrainState,
                                             camera_batch_from_frames,
                                             make_train_step,
                                             masked_chunk_aabb)

    on_tpu = jax.default_backend() == "tpu"
    n_points = 1_000_000 if on_tpu else 20_000
    img_h, img_w = (840, 1296) if on_tpu else (128, 256)
    th, tw = map(int, os.environ.get("PROF_TILE", "32x32").split("x"))
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
    pp = cfg.PipelineParams(raster_backend="pallas" if on_tpu else "jnp",
                            tile_size=(th, tw))
    lp, op_ = cfg.ModelParams(sh_degree=sh_degree), cfg.OptimizationParams()
    gt = np.random.default_rng(1).random((1, 3, img_h, img_w)).astype(
        np.float32)
    batch = camera_batch_from_frames(cam, frames, gt)
    state = TrainState(params=params, adam=init_adam(params),
                      active_count=jnp.int32(n_points), step=jnp.int32(0))
    stats = statistics.init_stats(caps.primitive_capacity)
    origin, extend = masked_chunk_aabb(state.params, state.active_count,
                                       pp.cluster_size)

    @jax.jit
    def size_probe(params):
        culled = render_preprocess(params, batch.planes[0],
                                   batch.center[0], sh_degree, pp, caps) \
            if False else render_preprocess(
                params, origin, extend, batch.planes[0], batch.center[0],
                sh_degree, pp, caps)
        return estimate_view_sizes(culled, batch.view[0], batch.proj[0],
                                   img_h, img_w, pp)

    s = np.asarray(size_probe(state.params))
    caps = cfg.bucketed_capacity(caps.primitive_capacity, *map(int, s))
    step0 = make_train_step(lp, op_, pp, caps, img_h, img_w, 1.0,
                            sh_degree, False, not on_tpu)
    state_c = jax.tree.map(jnp.array, state)
    stats_c = jax.tree.map(jnp.array, stats)
    _, _, _, pm = step0(state_c, stats_c, origin, extend, batch.view[0],
                        batch.proj[0], batch.planes[0], batch.center[0],
                        batch.images[0], None, jnp.int32(0))
    ts = np.asarray(pm["sizes"]) * [1.0, 1.05, 1.05]
    caps = cfg.bucketed_capacity(caps.primitive_capacity, *map(int, ts))
    step = make_train_step(lp, op_, pp, caps, img_h, img_w, 1.0,
                           sh_degree, False, not on_tpu)

    def run(state, stats):
        return step(state, stats, origin, extend, batch.view[0],
                    batch.proj[0], batch.planes[0], batch.center[0],
                    batch.images[0], None, jnp.int32(0))

    return run, state, stats


def main():
    import jax
    run, state, stats = build_step()
    # warm
    state, stats, _, m = run(state, stats)
    _ = np.asarray(m["loss"].ravel()[0:1])

    trace_dir = "/tmp/jax_trace_step"
    os.system(f"rm -rf {trace_dir}")
    n_steps = int(os.environ.get("PROF_STEPS", 4))
    with jax.profiler.trace(trace_dir):
        for _ in range(n_steps):
            state, stats, _, m = run(state, stats)
        _ = np.asarray(m["loss"].ravel()[0:1])

    xplanes = glob.glob(f"{trace_dir}/**/*.xplane.pb", recursive=True)
    print("xplane files:", xplanes, file=sys.stderr)
    # Parse the xplane proto directly: the tensorboard_plugin_profile
    # converter is unusable in this env (protobuf C-extension descriptor
    # mismatch), but the raw XSpace proto ships inside tensorflow and the
    # per-op durations live on the device plane's "XLA Ops" line.
    import collections
    from tensorflow.tsl.profiler.protobuf import xplane_pb2

    xs = xplane_pb2.XSpace()
    xs.ParseFromString(open(xplanes[0], "rb").read())
    plane = [p for p in xs.planes if "TPU" in p.name or "GPU" in p.name
             or "device" in p.name.lower()][0]
    agg, num = collections.Counter(), collections.Counter()
    total = 0.0
    for line in plane.lines:
        if line.name != "XLA Ops":
            continue
        for ev in line.events:
            name = plane.event_metadata[ev.metadata_id].name
            ms = ev.duration_ps / 1e9
            agg[name] += ms
            num[name] += 1
            total += ms
    print(f"total XLA-op time {total / n_steps:.1f} ms/step "
          f"({n_steps} steps)")
    rows = [{"ms_per_step": round(ms / n_steps, 2),
             "calls_per_step": num[name] // n_steps,
             "op": name[:160]}
            for name, ms in agg.most_common(60)]
    for r in rows[:30]:
        print(json.dumps(r))
    out_path = "/tmp/hlo_stats.json"
    with open(out_path, "w") as f:
        json.dump({"ms_per_step_total": total / n_steps, "ops": rows}, f,
                  indent=1)
    print("wrote", out_path)


if __name__ == "__main__":
    main()
