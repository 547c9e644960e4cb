"""Microbench: two-level scan variants vs plain cumsum/cummax at binning
scale (PERF.md remaining hot spot: expansion scans).

Run: python scripts/microbench_scan.py [/tmp/scan.log]
"""
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

_out = open(sys.argv[1], "w", buffering=1) if len(sys.argv) > 1 else sys.stdout


def log(msg):
    _out.write(msg + "\n")


def readback(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[0:1])[0]


def bench(name, fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    readback(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    readback(out)
    dt = (time.perf_counter() - t0) / iters * 1000
    log(json.dumps({"name": name, "ms": round(dt, 3)}))
    return dt


def two_level_sum(x, k):
    c = x.shape[0] // k
    xc = x.reshape(c, k)
    inner = jnp.cumsum(xc, axis=1)
    carry = jnp.cumsum(inner[:, -1]) - inner[:, -1]
    return (inner + carry[:, None]).reshape(-1)


def two_level_sum_T(x, k):
    c = x.shape[0] // k
    xc = x.reshape(c, k).T  # [k, c]: scan along sublanes
    inner = jnp.cumsum(xc, axis=0)
    carry = jnp.cumsum(inner[-1, :]) - inner[-1, :]
    return (inner + carry[None, :]).T.reshape(-1)


def two_level_max(x, k):
    c = x.shape[0] // k
    xc = x.reshape(c, k)
    inner = jax.lax.cummax(xc, axis=1)
    tops = inner[:, -1]
    carry = jnp.where(jnp.arange(c) == 0, jnp.iinfo(x.dtype).min,
                      jnp.roll(jax.lax.cummax(tops), 1))
    return jnp.maximum(inner, carry[:, None]).reshape(-1)


def main():
    log("backend: " + jax.default_backend())
    n = 2_900_992  # ~entry capacity, multiple of 512
    key = jax.random.PRNGKey(0)
    x = jax.random.randint(key, (n,), 0, 3, dtype=jnp.int32)
    readback(x)

    r_plain = bench("cumsum_plain", jnp.cumsum, x)
    for k in (128, 256, 512, 1024):
        bench(f"cumsum_2l_k{k}", lambda v, kk=k: two_level_sum(v, kk), x)
    bench("cumsum_2l_T512", lambda v: two_level_sum_T(v, 512), x)

    bench("cummax_plain", jax.lax.cummax, x)
    for k in (256, 512, 1024):
        bench(f"cummax_2l_k{k}", lambda v, kk=k: two_level_max(v, kk), x)

    # correctness spot check (ints: exact)
    a = np.asarray(jax.jit(lambda v: two_level_sum(v, 512))(x))
    b = np.cumsum(np.asarray(x))
    log(f"cumsum exact: {bool((a == b).all())}")
    a = np.asarray(jax.jit(lambda v: two_level_max(v, 512))(x))
    b = np.maximum.accumulate(np.asarray(x))
    log(f"cummax exact: {bool((a == b).all())}")
    log("done")


if __name__ == "__main__":
    main()
