"""Microbench: the two reduce gathers (fusion.9 / fusion.10) at step shapes.

fusion.9: [E,10] row-gather by a random permutation (grads -> point order)
fusion.10: [P] boundary gather from the [E+1,10] cumsum (monotonic indices)

The HLO trace (PERF.md) shows fusion.9 at 40 ms despite the
optimization_barrier fence that once measured 17 ms; this isolates the
gather from the producing graph to find which form restores the floor.

    python scripts/microbench_gather3.py       (TPU, ~2 min)
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

    E, P, K = 2_723_328, 1_015_808, 10
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(E).astype(np.int32))
    cols = [jnp.asarray(rng.random(E, dtype=np.float32)) for _ in range(K)]
    counts = rng.multinomial(E, np.ones(P) / P).astype(np.int32)
    ends = jnp.asarray(np.minimum(np.cumsum(counts), E).astype(np.int32))
    cum = jnp.asarray(rng.random((E + 1, K), dtype=np.float32))

    # --- fusion.9 candidates: [E,K] row-gather by random perm ---
    def g_stack_barrier(perm, *cols):
        src = jax.lax.optimization_barrier(jnp.stack(cols, axis=1))
        return jnp.take(src, perm, axis=0)

    def g_premat(perm, src):                      # source already a buffer
        return jnp.take(src, perm, axis=0)

    def g_split2(perm, *cols):
        a = jax.lax.optimization_barrier(jnp.stack(cols[:5], axis=1))
        b = jax.lax.optimization_barrier(jnp.stack(cols[5:], axis=1))
        return jnp.take(a, perm, axis=0), jnp.take(b, perm, axis=0)

    def g_flat_interleave(perm, *cols):
        # physically row-major via flat layout: build [E*K] with row i at
        # [i*K, (i+1)*K), gather K scalars per row as one flat gather of
        # contiguous runs? jnp has no run-gather; emulate with K flat
        # gathers at offsets perm*K+j (each contiguous in source rows)
        flat = jax.lax.optimization_barrier(
            jnp.stack(cols, axis=1).reshape(-1))
        base = perm * K
        return jnp.stack([jnp.take(flat, base + j) for j in range(K)],
                         axis=1)

    src_buf = jax.device_put(np.asarray(jnp.stack(cols, axis=1)))

    bench("f9_stack_barrier(current)", g_stack_barrier, perm, *cols)
    bench("f9_source_is_buffer", g_premat, perm, src_buf)
    bench("f9_split_2x5", g_split2, perm, *cols)
    bench("f9_flat_interleave", g_flat_interleave, perm, *cols)

    # --- fusion.10 candidates: [P] boundary gather from [E+1,K] ---
    def b_take(ends, cum):
        return jnp.take(cum, ends, axis=0)

    def b_sorted(ends, cum):
        return cum.at[ends].get(indices_are_sorted=True)

    def b_take_T(ends, *cols):
        # gather from the K separate 1-D cumsum columns instead of the
        # 2-D array (each column contiguous; P sorted indices per column)
        return jnp.stack([jnp.take(c, ends) for c in cols], axis=0)

    cum_cols = [jax.device_put(np.asarray(cum[:, j])) for j in range(K)]
    bench("f10_take(current)", b_take, ends, cum)
    bench("f10_take_sorted_hint", b_sorted, ends, cum)
    bench("f10_percol_1d", b_take_T, ends, *cum_cols)

    def g_split3(perm, *cols):
        outs = []
        for lo, hi in ((0, 4), (4, 7), (7, 10)):
            s = jax.lax.optimization_barrier(jnp.stack(cols[lo:hi], axis=1))
            outs.append(jnp.take(s, perm, axis=0))
        return tuple(outs)

    def b_split2(ends, cum):
        a = jax.lax.optimization_barrier(cum[:, :5])
        b = jax.lax.optimization_barrier(cum[:, 5:])
        return jnp.take(a, ends, axis=0), jnp.take(b, ends, axis=0)

    def pipeline_split(perm, ends_pts, *cols):
        # end-to-end reduce shape: gather+cumsum+boundary, split 2x5
        outs = []
        for lo, hi in ((0, 5), (5, 10)):
            s = jax.lax.optimization_barrier(jnp.stack(cols[lo:hi], axis=1))
            rs = jnp.take(s, perm, axis=0)
            c = jnp.cumsum(rs, axis=0)
            c = jnp.concatenate([jnp.zeros((1, hi - lo), c.dtype), c], 0)
            outs.append(jnp.take(c, ends_pts, axis=0))
        return tuple(outs)

    def pipeline_mono(perm, ends_pts, *cols):
        s = jax.lax.optimization_barrier(jnp.stack(cols, axis=1))
        rs = jnp.take(s, perm, axis=0)
        c = jnp.cumsum(rs, axis=0)
        c = jnp.concatenate([jnp.zeros((1, K), c.dtype), c], 0)
        return jnp.take(c, ends_pts, axis=0)

    bench("f9_split_3way", g_split3, perm, *cols)
    bench("f10_split_2x5", b_split2, ends, cum)
    bench("pipeline_mono_10", pipeline_mono, perm, ends, *cols)
    bench("pipeline_split_2x5", pipeline_split, perm, ends, *cols)


if __name__ == "__main__":
    main()
