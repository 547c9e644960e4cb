"""Microbench round 2c: backward-reduce candidates at current bench scale.

Writes progress lines (unbuffered) so a hung stage is attributable; run
with a file arg: ``python scripts/microbench_reduce2.py /tmp/red2.log``.
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

M = 1_000_000
E = 2_899_968  # multiple of 512 (two-level cumsum chunking)

_out = open(sys.argv[1], "w", buffering=1) if len(sys.argv) > 1 else sys.stdout


def log(msg):
    _out.write(msg + "\n")


def readback(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[0:1])[0]


def bench(name, fn, *args, iters=5):
    log(f"compile {name} ...")
    t0 = time.perf_counter()
    f = jax.jit(fn)
    out = f(*args)
    readback(out)
    log(f"  compiled in {time.perf_counter() - t0:.1f}s")
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    readback(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    log(json.dumps({"name": name, "ms": round(dt, 2)}))
    return dt


def main():
    log("backend: " + jax.default_backend())
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    rows = jax.random.normal(k1, (10, E), jnp.float32)
    ids_rand = jax.random.randint(k2, (E,), 0, M, dtype=jnp.int32)
    ids_sorted = jnp.sort(ids_rand)
    readback((rows, ids_sorted))
    log("inputs ready")

    def nine_1d(r, i):
        return jnp.stack([jax.ops.segment_sum(r[c], i, num_segments=M)
                          for c in range(9)])

    def nine_1d_flag(r, i):
        return jnp.stack([jax.ops.segment_sum(
            r[c], i, num_segments=M, indices_are_sorted=True)
            for c in range(9)])

    def sort_then(r, i):
        ops = jax.lax.sort((i,) + tuple(r[c] for c in range(9)), num_keys=1)
        return jnp.stack([jax.ops.segment_sum(
            ops[1 + c], ops[0], num_segments=M, indices_are_sorted=True)
            for c in range(9)])

    def argsort_rowgather_flagseg(r, i):
        """One id-argsort + ONE [E,10] row-gather to id-sorted order, then
        per-column contiguous segment_sum with indices_are_sorted."""
        ids_s, perm = jax.lax.sort_key_val(
            i, jnp.arange(E, dtype=jnp.int32))
        rs = jnp.take(r.T, perm, axis=0)          # [E, 10] row-gather
        return jnp.stack([jax.ops.segment_sum(
            rs[:, c], ids_s, num_segments=M, indices_are_sorted=True)
            for c in range(9)])

    def argsort_rowgather_cumdiff(r, i, counts):
        """One id-argsort + ONE row-gather + two-level cumsum over [E,10],
        then per-point diff at boundaries (= cumsum of per-id counts)."""
        from litegs_tpu.ops import scan
        _, perm = jax.lax.sort_key_val(i, jnp.arange(E, dtype=jnp.int32))
        rs = jnp.take(r.T, perm, axis=0)          # [E, 10]
        # two-level cumsum along axis 0, vectorized over columns
        C = 512
        nch = E // C
        rc = rs.reshape(nch, C, 10)
        inner = jnp.cumsum(rc, axis=1)
        carry = jnp.cumsum(inner[:, -1, :], axis=0) - inner[:, -1, :]
        cum = (inner + carry[:, None, :]).reshape(E, 10)
        cum = jnp.concatenate([jnp.zeros((1, 10), cum.dtype), cum], axis=0)
        ends = scan.cumsum(counts)                # [M]
        hi = jnp.take(cum, ends, axis=0)          # [M, 10]
        lo = jnp.take(cum, ends - counts, axis=0)
        return (hi - lo).T

    # per-id counts consistent with ids_rand
    counts = jax.ops.segment_sum(jnp.ones((E,), jnp.int32), ids_rand,
                                 num_segments=M)
    readback(counts)

    bench("current_9x1d_random", nine_1d, rows, ids_rand)
    bench("nine_1d_sorted_noflag", nine_1d, rows, ids_sorted)
    bench("nine_1d_sorted_flag", nine_1d_flag, rows, ids_sorted)
    bench("sort9_then_flagseg", sort_then, rows, ids_rand)
    bench("argsort_rowgather_flagseg", argsort_rowgather_flagseg,
          rows, ids_rand)
    bench("argsort_rowgather_cumdiff", argsort_rowgather_cumdiff,
          rows, ids_rand, counts)

    # numerical sanity: cumdiff == segment_sum (up to reorder rounding)
    a = np.asarray(jax.jit(nine_1d)(rows, ids_rand))
    b = np.asarray(jax.jit(argsort_rowgather_cumdiff)(
        rows, ids_rand, counts))[:9]
    err = np.max(np.abs(a - b) / (np.abs(a).max() + 1e-6))
    log(f"cumdiff maxrelerr vs segment_sum: {err:.2e}")
    log("done")


if __name__ == "__main__":
    main()
