"""Round-3 microbenchmarks (run on the TPU).

1. reduce_entries_to_points at K=6 (the stats reduce width): the k>5
   two-group split (3+3) vs a single 6-wide pass -- ADVICE r2 flagged the
   split was only measured at K=10 and the padded 3-wide lanes could
   regress at K=6.
2. signed_bincount chunk size: the lax.scan over 512-element chunks runs
   ~7.6k sequential one-hot MXU dots per step (while.9 in the HLO trace);
   larger chunks amortize the loop overhead.

    python scripts/microbench_r3.py        (TPU, ~3 min)
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def readback(x):
    import jax
    leaf = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "ravel")][0]
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
    print(json.dumps({"case": name, "ms": round(dt, 2)}), flush=True)
    return dt


def main():
    import jax
    import jax.numpy as jnp
    from litegs_tpu.ops import scan
    from litegs_tpu.ops.binning import signed_bincount

    E, P = 2_723_328, 1_015_808
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(E).astype(np.int32))
    counts = rng.multinomial(E, np.ones(P) / P).astype(np.int32)
    ends = jnp.asarray(np.minimum(np.cumsum(counts), E).astype(np.int32))

    def reduce_groups(splits, *cols):
        """The reduce's gather+cumsum+boundary pipeline with a given
        column grouping (mirrors ops/raster.reduce_entries_to_points)."""
        out = []
        base = 0
        for width in splits:
            gcols = cols[base:base + width]
            base += width
            src = jax.lax.optimization_barrier(jnp.stack(gcols, axis=1))
            rs = jnp.take(src, perm, axis=0)
            cum = scan.cumsum2d(rs)
            cum = jnp.concatenate(
                [jnp.zeros((1, width), cum.dtype), cum], axis=0)
            hi = jnp.take(cum, ends, axis=0)
            lo = jnp.concatenate(
                [jnp.zeros((1, width), hi.dtype), hi[:-1]], axis=0)
            out.append(hi - lo)
        return jnp.concatenate(out, axis=1)

    for k in (6, 9, 10, 12, 13):
        cols = [jnp.asarray(rng.random(E, dtype=np.float32))
                for _ in range(k)]
        h = (k + 1) // 2
        bench(f"reduce_k{k}_split_{h}+{k - h}",
              lambda *c, h=h, k=k: reduce_groups((h, k - h), *c), *cols)
        bench(f"reduce_k{k}_unsplit",
              lambda *c, k=k: reduce_groups((k,), *c), *cols)

    # signed_bincount chunk sweep at the bench shape (two edges per row)
    n_bins = 1109
    n_edges = 3_880_704
    idx = jnp.asarray(rng.integers(0, n_bins, n_edges).astype(np.int32))
    sign = jnp.asarray(rng.choice([-1.0, 0.0, 1.0], n_edges)
                       .astype(np.float32))
    for chunk in (512, 1024, 2048, 4096):
        bench(f"signed_bincount_c{chunk}",
              lambda i, s, c=chunk: signed_bincount(i, s, n_bins, chunk=c),
              idx, sign)


def bench_stats_scatter():
    """7 independent 1-D index-adds (update_stats today) vs ONE [Mv, 7]
    row-scatter-add -- per-index overhead should dominate like gathers."""
    import jax
    import jax.numpy as jnp
    mv, n = 1_015_808, 1_048_576 + 16384
    rng = np.random.default_rng(1)
    idx = jnp.asarray(rng.integers(0, n, mv).astype(np.int32))
    vals = [jnp.asarray(rng.random(mv, dtype=np.float32)) for _ in range(7)]
    accs = [jnp.zeros((n,), jnp.float32) for _ in range(7)]

    def seven(idx, accs, vals):
        return [a.at[idx].add(v, mode="drop")
                for a, v in zip(accs, vals)]

    def batched(idx, accs, vals):
        stacked = jnp.stack(vals, axis=1)                 # [Mv, 7]
        acc = jnp.stack(accs, axis=1)                     # [N, 7]
        out = acc.at[idx].add(stacked, mode="drop")
        return [out[:, i] for i in range(7)]

    bench("stats_scatter_7x1d", seven, idx, accs, vals)
    bench("stats_scatter_rowbatched", batched, idx, accs, vals)


if __name__ == "__main__":
    main()
    if os.environ.get("BENCH_STATS_SCATTER"):
        bench_stats_scatter()
