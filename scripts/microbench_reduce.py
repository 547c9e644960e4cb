"""Microbench round 2b: candidate replacements for the backward
per-entry -> per-point gradient reduction (segment_sum [E,10] ~650 ms
standalone, PERF.md)."""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 1_000_000
R = 2_400_000
E = 4_800_000


def readback(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[0:1])[0]


def bench(name, fn, *args, iters=8):
    f = jax.jit(fn)
    out = f(*args)
    readback(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    readback(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    print(json.dumps({"name": name, "ms": round(dt, 3)}), flush=True)
    return dt


def main():
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    k1, k2 = jax.random.split(key)
    vals = jax.random.normal(k1, (E, 10), jnp.float32)
    ids_rand = jax.random.randint(k2, (E,), 0, M, dtype=jnp.int32)
    ids_sorted = jnp.sort(ids_rand)
    # contiguous emission-order structure: entries grouped per row
    # (~E/R per row), rows grouped per point (~R/M per point)
    ent_owner = jnp.sort(jax.random.randint(k2, (E,), 0, R, jnp.int32))
    row_owner = jnp.sort(jax.random.randint(k1, (R,), 0, M, jnp.int32))

    bench("segsum_unsorted", lambda v, i: jax.ops.segment_sum(
        v, i, num_segments=M), vals, ids_rand)
    bench("segsum_sorted_flag", lambda v, i: jax.ops.segment_sum(
        v, i, num_segments=M, indices_are_sorted=True), vals, ids_sorted)
    bench("segsum_sorted_noflag", lambda v, i: jax.ops.segment_sum(
        v, i, num_segments=M), vals, ids_sorted)
    bench("segsum_Ex1_unsorted", lambda v, i: jax.ops.segment_sum(
        v[:, 0], i, num_segments=M), vals, ids_rand)

    def two_level(v, eo, ro):
        per_row = jax.ops.segment_sum(v, eo, num_segments=R,
                                      indices_are_sorted=True)
        return jax.ops.segment_sum(per_row, ro, num_segments=M,
                                   indices_are_sorted=True)

    bench("two_level_sorted", two_level, vals, ent_owner, row_owner)

    # row-gather of [E,16] grads by an inverse permutation (the cost of
    # moving aligned-order grads back to emission order)
    perm = jax.random.permutation(k1, E)
    v16 = jax.random.normal(k1, (E, 16), jnp.float32)
    bench("rowgather_Ex16_perm", lambda v, p: jnp.take(v, p, axis=0),
          v16, perm)

    # one-hot matmul reduction per 128-chunk? -- entries->chunk-of-point
    # (chunks of 128 points): scatter into [M/128, 128, 10] via ids//128?
    # equivalent scatter; skip.

    # sort by point id carrying 10 payloads, then sorted-flag segsum
    def sort_then_reduce(v, i):
        ops = jax.lax.sort((i,) + tuple(v[:, j] for j in range(10)),
                           num_keys=1)
        vv = jnp.stack(ops[1:], axis=1)
        return jax.ops.segment_sum(vv, ops[0], num_segments=M,
                                   indices_are_sorted=True)

    bench("sort10_then_segsum", sort_then_reduce, vals, ids_rand)


if __name__ == "__main__":
    main()
