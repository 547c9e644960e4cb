#!/usr/bin/env python
"""On-chip debug/timing for the streaming binning kernels.

Runs each streaming entry point standalone at bench-like sizes (the CPU
suite only exercises interpret mode; Mosaic's real lowering and runtime
guards differ), then the full streamed build_tile_table.  Prints stage
status + timings so a failure isolates to one kernel.

    python scripts/debug_stream.py
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def sync(x):
    import jax
    leaf = [l for l in jax.tree_util.tree_leaves(x) if hasattr(l, "ravel")][0]
    return np.asarray(leaf.ravel()[0:1])[0]


def timeit(name, fn, *args, iters=5):
    t = None
    try:
        out = fn(*args)
        sync(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        sync(out)
        t = (time.perf_counter() - t0) / iters * 1000
        print(f"[ok] {name}: {t:.2f} ms", flush=True)
        return out, t
    except Exception as e:  # noqa: BLE001
        print(f"[FAIL] {name}: {type(e).__name__}: {e}", flush=True)
        return None, t


def main():
    import jax
    import jax.numpy as jnp
    from litegs_tpu.ops import stream_gather as sg

    rng = np.random.default_rng(0)

    # ---- expansion-1 scale: M=1,015,808 items -> 4M row slots ----
    m = 1_015_808
    row_cap = 4_063_232
    n_live = 900_000
    counts = np.zeros(m, np.int32)
    counts[:n_live] = rng.integers(1, 8, n_live)  # contiguous prefix
    scale = row_cap * 0.85 / counts.sum()
    counts[:n_live] = np.maximum((counts[:n_live] * scale).astype(np.int32), 1)
    attrs = rng.standard_normal((16, m)).astype(np.float32)
    attrs_d = jnp.asarray(attrs)
    counts_d = jnp.asarray(counts)
    out1, t1 = timeit(
        "expand1 windowed [16,1M]->4M sps512 win640",
        lambda a, c: sg.expand_attrs_windowed(
            a, c, row_cap, window_items=640, slots_per_step=512),
        attrs_d, counts_d)
    if out1 is not None:
        out, rank, total, ok = out1
        total = int(total)
        print(f"   total={total} expect={int(counts.sum())} ok={bool(ok)}")
        # spot-check a slice against numpy replication
        starts = np.cumsum(counts) - counts
        own = np.repeat(np.arange(m), counts)[:total]
        sl = slice(1000, 1512)
        got = np.asarray(out[3][sl.start:sl.stop])
        want = attrs[3][own[sl]]
        print(f"   maxdiff slice: {np.abs(got - want).max():.2e}")

    # ---- expansion-2 scale: 4M rows -> 2.35M entries ----
    ent_cap = 2_347_776
    counts2 = np.zeros(row_cap, np.int32)
    n_rows_live = 1_500_000
    counts2[:n_rows_live] = rng.integers(1, 3, n_rows_live)
    counts2[:n_rows_live] = np.minimum(counts2[:n_rows_live], 2)
    # keep within capacity
    cum = np.cumsum(counts2)
    cut = np.searchsorted(cum, int(ent_cap * 0.9))
    counts2[cut:] = 0
    attrs2 = rng.standard_normal((8, row_cap)).astype(np.float32)
    out2, t2 = timeit(
        "expand2 windowed [8,4M]->2.35M sps512 win768",
        lambda a, c: sg.expand_attrs_windowed(
            a, c, ent_cap, window_items=768, slots_per_step=512),
        jnp.asarray(attrs2), jnp.asarray(counts2))
    if out2 is not None:
        print(f"   total={int(out2[2])} expect={int(counts2.sum())} "
              f"ok={bool(out2[3])}")

    # ---- gather_blocks at alignment scale ----
    nb = ent_cap // 128
    src_lo = np.sort(rng.integers(0, row_cap - 200, nb)).astype(np.int32)
    out3, t3 = timeit(
        "gather_blocks [8,4M] x 18344 blocks",
        lambda a, s: sg.gather_blocks(a, s),
        jnp.asarray(attrs2), jnp.asarray(src_lo))

    # ---- full streamed build_tile_table at bench shape (synthetic
    # projection outputs with bench-like statistics) ----
    from litegs_tpu.ops import binning

    n_points = 1_000_000
    img_h, img_w = 840, 1296
    ndc = np.zeros((4, m), np.float32)
    ndc[0] = rng.uniform(-1.25, 1.25, m)
    ndc[1] = rng.uniform(-1.25, 1.25, m)
    view_z = rng.uniform(0.5, 8.0, m).astype(np.float32)
    a = rng.uniform(0.05, 1.5, m).astype(np.float32)
    c = rng.uniform(0.05, 1.5, m).astype(np.float32)
    b = (rng.uniform(-0.9, 0.9, m) * np.sqrt(a * c)).astype(np.float32)
    inv_cov = np.stack([a, b, c])
    op = rng.uniform(0.01, 1.0, m).astype(np.float32)
    valid = np.arange(m) < n_points

    for strm in (False, True):
        fn = jax.jit(lambda nd, vz, ic, o, v, s=strm: binning.build_tile_table(
            nd, vz, ic, o, v, img_h, img_w, 32, 24, row_cap, ent_cap,
            stream=s))
        out, t = timeit(f"build_tile_table stream={strm}", fn,
                        jnp.asarray(ndc), jnp.asarray(view_z),
                        jnp.asarray(inv_cov), jnp.asarray(op),
                        jnp.asarray(valid))
        if out is not None:
            print(f"   n_entries={int(out.num_entries)} "
                  f"overflow={bool(out.overflow)}")


if __name__ == "__main__":
    main()
