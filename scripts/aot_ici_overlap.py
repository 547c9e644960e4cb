#!/usr/bin/env python
"""AOT-compile the D=8 parallel train step against a v5e:2x4 TPU topology
and report whether the gradient all-reduce overlaps the backward pass.

No TPU hardware is needed: `jax.experimental.topologies.get_topology_desc`
gives a detached v5e topology and `jit(...).lower(...).compile()` runs the
real TPU compiler against it, so the *optimized* HLO shows exactly how XLA
schedules the ICI collectives (async `all-reduce-start`/`-done` pairs
bracketing compute = overlapped; a bare synchronous `all-reduce` = not).

BASELINE.md asks for "psum overlapped with tile backward"; the CPU
virtual-mesh HLO (scripts/scaling_mesh.py) cannot answer that because the
CPU backend never emits async collective pairs.  This script is the
hardware-truth artifact (VERDICT r3 next-round item 5).

Writes ICI_OVERLAP_r{N}.md + .json at the repo root (N from
LITEGS_ROUND, default 5).  Round 5 adds per-dtype all-reduce census +
byte volumes: the gradient psum rides bf16 now
(pp.grad_allreduce_dtype), halving the wire volume the r4 bound was
computed from, and the reduce_scatter count answers whether the
sharded-stats psum_scatter actually lowers to reduce-scatter.

Run (CPU-only, no TPU tunnel needed):
  JAX_PLATFORMS=cpu python scripts/aot_ici_overlap.py
"""
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import numpy as np


def build_abstract_args(mesh, lp, pp, caps, img_h, img_w, d):
    """ShapeDtypeStructs (with shardings) for every step input."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from litegs_tpu import parallel
    from litegs_tpu.scene.gaussians import (create_gaussians, pad_params,
                                            pad_to_chunk)
    from litegs_tpu.training import statistics
    from litegs_tpu.training.optimizer import init_adam
    from litegs_tpu.training.trainer import TrainState

    rng = np.random.default_rng(0)
    n_seed = 1024
    xyz = rng.standard_normal((n_seed, 3)).astype(np.float32)
    rgb = rng.random((n_seed, 3)).astype(np.float32)
    params = pad_params(pad_to_chunk(create_gaussians(xyz, rgb,
                                                      lp.sh_degree),
                                     pp.cluster_size),
                        caps.primitive_capacity)
    state = TrainState(params=params, adam=init_adam(params),
                       active_count=jnp.int32(n_seed), step=jnp.int32(0))
    stats = statistics.init_stats(caps.primitive_capacity)
    nchunks = caps.primitive_capacity // pp.cluster_size
    origin = np.zeros((3, nchunks), np.float32)
    extend = np.zeros((3, nchunks), np.float32)
    cam = {
        "view": np.zeros((d, 4, 4), np.float32),
        "proj": np.zeros((d, 4, 4), np.float32),
        "planes": np.zeros((d, 6, 4), np.float32),
        "center": np.zeros((d, 3), np.float32),
        "gt": np.zeros((d, 3, img_h, img_w), np.float32),
        "wt": np.ones((d,), np.float32),
    }

    rep = NamedSharding(mesh, P())
    shard_stats = NamedSharding(mesh, P(parallel.DATA_AXIS))

    def sds(x, sh):
        return jax.ShapeDtypeStruct(np.shape(x), np.asarray(x).dtype
                                    if not hasattr(x, "dtype") else x.dtype,
                                    sharding=sh)

    a_state = jax.tree.map(lambda x: sds(x, rep), state)
    a_stats = jax.tree.map(lambda x: sds(x, shard_stats), stats)
    a_origin, a_extend = sds(origin, rep), sds(extend, rep)
    a_cam = [sds(cam[k], NamedSharding(
        mesh, P(parallel.DATA_AXIS, *([None] * (cam[k].ndim - 1)))))
        for k in ("view", "proj", "planes", "center", "gt", "wt")]
    return (a_state, a_stats, a_origin, a_extend, *a_cam)


def analyze(txt: str) -> dict:
    """Collective-scheduling census of one optimized HLO module."""
    res = {
        "all_reduce_start": len(re.findall(r"all-reduce-start", txt)) // 2,
        "all_reduce_sync": len(re.findall(r"= f32\[[^\]]*\] all-reduce\(|"
                                          r" all-reduce\(", txt)),
        "reduce_scatter": len(re.findall(r"reduce-scatter", txt)),
        "all_gather_start": len(re.findall(r"all-gather-start", txt)) // 2,
        "all_gather_sync": len(re.findall(r" all-gather\(", txt)),
        "collective_permute": len(re.findall(r"collective-permute", txt)),
    }
    # per-dtype census + byte volume of every all-reduce/reduce-scatter
    vols = {}
    for m in re.finditer(
            r"= \(?([a-z0-9]+)\[([0-9,]*)\][^=]*?"
            r"(all-reduce|reduce-scatter)\(", txt):
        dt, shape, kind = m.group(1), m.group(2), m.group(3)
        n = 1
        for d in shape.split(","):
            if d:
                n *= int(d)
        bytes_ = n * {"f32": 4, "bf16": 2, "s32": 4, "u32": 4, "pred": 1,
                      "f16": 2}.get(dt, 4)
        key = f"{kind}:{dt}"
        vols[key] = vols.get(key, [0, 0])
        vols[key][0] += 1
        vols[key][1] += bytes_
    res["collective_volume"] = {
        k: {"count": v[0], "bytes": v[1]} for k, v in vols.items()}
    # raw instruction lines (truncated) -- ground truth for what the
    # gradient psum / stats psum_scatter actually lowered to
    res["collective_lines"] = [
        ln.strip()[:160] for ln in txt.splitlines()
        if re.search(r"all-reduce\(|reduce-scatter|all-gather\(", ln)]
    return res


def main():
    import jax

    jax.config.update("jax_platforms", "cpu")   # axon plugin override
    import jax.numpy as jnp  # noqa: F401
    from jax.experimental import topologies
    from jax.sharding import Mesh

    from litegs_tpu import config as cfg, parallel

    topo = topologies.get_topology_desc("v5e:2x4", platform="tpu")
    d = len(topo.devices)
    mesh = Mesh(np.asarray(topo.devices), (parallel.DATA_AXIS,))
    print(f"topology: {topo.devices[0].device_kind} x{d}", flush=True)

    lp = cfg.ModelParams(sh_degree=2)
    op = cfg.OptimizationParams()
    pp = cfg.PipelineParams(raster_backend="pallas")
    caps = cfg.CapacityParams(primitive_capacity=65536,
                              visible_capacity=32768,
                              row_capacity=262144,
                              entry_capacity=1048576)
    img_h, img_w = 256, 384

    step = parallel.make_parallel_train_step(
        lp, op, pp, caps, img_h, img_w, spatial_lr_scale=1.0,
        sh_degree=lp.sh_degree, collect_stats=True, mesh=mesh,
        sharded_stats=True)
    args = build_abstract_args(mesh, lp, pp, caps, img_h, img_w, d)
    print("lowering...", flush=True)
    lowered = step.lower(*args)
    print("compiling with the TPU compiler (detached)...", flush=True)
    compiled = lowered.compile()
    txt = compiled.as_text()
    res = analyze(txt)
    res["hlo_bytes"] = len(txt)

    # position check: does compute sit between the grad all-reduce's
    # start and done?  Count ops strictly between the first
    # all-reduce-start and its matching -done in the entry computation.
    lines = txt.splitlines()
    gaps = []
    start_ids = {}
    for i, ln in enumerate(lines):
        m = re.search(r"(%?\S+) = \S+ all-reduce-start", ln)
        if m:
            start_ids[m.group(1).rstrip(")")] = i
        m2 = re.search(r"all-reduce-done\(([^)]+)\)", ln)
        if m2 and start_ids:
            # nearest preceding start
            j = max(start_ids.values())
            gaps.append(i - j - 1)
    res["ops_inside_async_windows"] = gaps
    print(json.dumps(res, indent=2))

    rn = os.environ.get("LITEGS_ROUND", "5")
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(root, f"ICI_OVERLAP_r{rn}.json"), "w") as f:
        json.dump(res, f, indent=2)
    with open(os.path.join(root, f"ICI_OVERLAP_r{rn}.md"), "w") as f:
        f.write(
            f"# ICI overlap proof (round {rn})\n\n"
            "AOT compile of the D=8 data-parallel train step against a "
            "detached\n`v5e:2x4` topology (scripts/aot_ici_overlap.py; no "
            "hardware attached --\nthe real TPU compiler's optimized HLO "
            "is the artifact).\n\n"
            f"- async all-reduce start/done pairs: "
            f"**{res['all_reduce_start']}**\n"
            f"- synchronous all-reduce ops: {res['all_reduce_sync']}\n"
            f"- reduce-scatter ops (sharded stats psum_scatter): "
            f"{res['reduce_scatter']}\n"
            f"- all-gather pairs/sync: {res['all_gather_start']}/"
            f"{res['all_gather_sync']}\n"
            f"- instructions scheduled inside each async window: "
            f"{res['ops_inside_async_windows']}\n\n"
            "Interpretation: a nonzero async-pair count with >0 "
            "instructions inside\nthe window means XLA overlaps the "
            "gradient psum with the surrounding\nbackward compute "
            "(BASELINE: 'allreduce overlapped with tile backward').\n"
            f"- per-dtype collective volume: {res['collective_volume']}\n")
    print(f"wrote ICI_OVERLAP_r{rn}.{{md,json}}")


if __name__ == "__main__":
    main()
