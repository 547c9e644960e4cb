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

M = 1_000_000
E = 2_900_000

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

    bench("current_9x1d_random", nine_1d, rows, ids_rand)
    bench("nine_1d_sorted_noflag", nine_1d, rows, ids_sorted)
    bench("nine_1d_sorted_flag", nine_1d_flag, rows, ids_sorted)
    bench("sort9_then_flagseg", sort_then, rows, ids_rand)
    log("done")


if __name__ == "__main__":
    main()
