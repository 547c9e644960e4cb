"""Round-2 microbenchmark: candidate replacements for the entry-pack gathers.

Measures, on the real TPU with forced readbacks (see memory:
axon-tpu-performance-quirks — block_until_ready alone is unreliable):

  1. k independent 1-D gathers [E] <- [M]            (current pack strategy)
  2. one row-gather [M, k] take axis=0 -> [E, k]     (amortize per-index cost)
  3. sort payload marginal cost (k payload operands)
  4. cummax / cumsum over [E]
  5. scatter-max of M items into [E]
  6. two-key lexicographic sort vs single packed key

Prints one JSON line per measurement.
"""
import json
import time

import jax
import jax.numpy as jnp
import numpy as np

M = 1_000_000
E = 4_800_000


def readback(x):
    # 4-byte device-side slice: syncs without dragging the whole output
    # through the (slow) axon tunnel
    leaf = jax.tree_util.tree_leaves(x)[0]
    return np.asarray(leaf.ravel()[0:1])[0]


def bench(name, fn, *args, iters=10):
    f = jax.jit(fn)
    out = f(*args)
    readback(out)  # compile + sync
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
    k1, k2, k3 = jax.random.split(key, 3)
    idx = jax.random.randint(k1, (E,), 0, M, dtype=jnp.int32)
    idx_sorted = jnp.sort(idx)  # pack indices are sorted by tile segments
    src = jax.random.normal(k2, (M,), jnp.float32)
    src8 = jax.random.normal(k2, (M, 8), jnp.float32)
    src16 = jax.random.normal(k2, (M, 16), jnp.float32)
    src8t = jnp.asarray(src8.T)  # [8, M]
    vals_e = jax.random.normal(k3, (E,), jnp.float32)
    keys_e = jax.random.randint(k3, (E,), 0, 4096, dtype=jnp.int32)
    ints_e = jax.random.randint(k3, (E,), 0, M, dtype=jnp.int32)

    # --- 1: k 1-D gathers ---
    bench("gather1d_x1", lambda i: jnp.take(src, i), idx)
    bench("gather1d_x1_sortedidx", lambda i: jnp.take(src, i), idx_sorted)
    bench("gather1d_x8",
          lambda i: sum(jnp.take(src8t[j], i) for j in range(8)), idx)

    # --- 2: row gathers ---
    bench("rowgather_Mx8", lambda i: jnp.take(src8, i, axis=0).sum(axis=1),
          idx)
    bench("rowgather_Mx8_sortedidx",
          lambda i: jnp.take(src8, i, axis=0).sum(axis=1), idx_sorted)
    bench("rowgather_Mx16", lambda i: jnp.take(src16, i, axis=0).sum(axis=1),
          idx)

    # dynamic_slice-in-vmap style gather (often lowers differently)
    def ds_gather(i):
        return jax.vmap(lambda j: jax.lax.dynamic_slice(src8, (j, 0),
                                                        (1, 8)))(i)
    bench("vmap_dynslice_Mx8", lambda i: ds_gather(i).sum(), idx[:E // 4])

    # --- 3: sort payload marginal cost ---
    bench("sort_key_only", lambda k: jax.lax.sort((k,), num_keys=1), keys_e)
    bench("sort_1payload",
          lambda k, v: jax.lax.sort((k, v), num_keys=1), keys_e, vals_e)

    def sort_8payload(k, v):
        return jax.lax.sort((k,) + tuple(v + float(j) for j in range(8)),
                            num_keys=1)
    bench("sort_8payload", sort_8payload, keys_e, vals_e)

    # --- 4: scans ---
    bench("cumsum_E_i32", lambda x: jnp.cumsum(x), ints_e)
    bench("cummax_E_i32", lambda x: jax.lax.cummax(x), ints_e)
    # scan over 2-D (byte-count equal): is a wide scan cheaper per element?
    e8 = ints_e[: E // 8].astype(jnp.float32)
    v2d = jnp.stack([e8 + j for j in range(8)], axis=1)  # [E/8, 8]
    bench("cumsum_E8x8_axis0", lambda x: jnp.cumsum(x, axis=0), v2d)

    # --- 5: scatter ---
    sm = jax.random.randint(k1, (M,), 0, E, dtype=jnp.int32)
    item = jnp.arange(M, dtype=jnp.int32)
    bench("scatter_max_MtoE",
          lambda s, it: jnp.zeros((E,), jnp.int32).at[s].max(
              it, mode="drop", unique_indices=True), sm, item)

    # --- 6: multi-key sort ---
    depth = jax.random.normal(k2, (E,), jnp.float32)
    bench("sort_2key_lex",
          lambda a, b, v: jax.lax.sort((a, b, v), num_keys=2),
          keys_e, depth, vals_e)

    # --- 7: segment_sum (bwd reduction) [E,10] ---
    st = jax.random.normal(k2, (E, 10), jnp.float32)
    bench("segsum_Ex10",
          lambda s, i: jax.ops.segment_sum(s, i, num_segments=M),
          st, idx_sorted)
    bench("segsum_Ex10_unsorted",
          lambda s, i: jax.ops.segment_sum(s, i, num_segments=M),
          st, idx)


if __name__ == "__main__":
    main()
