"""Streaming expansion / monotonic-gather Pallas kernels.

XLA:TPU lowers random gathers and scatters at ~1/25th of streaming
bandwidth, which made "replicate per-item attributes to per-entry slots"
the dominant cost of binning + rasterizer packing.  These kernels exploit
the structure the pipeline guarantees instead:

* expansion owners are NON-DECREASING and CONSECUTIVE (every live item
  emits >= 1 slot), so the owners of one 128-slot output block span at most
  128 consecutive items: two adjacent 128-column input blocks always cover
  them.  A block then needs one compare-matrix to decode (owner, rank) and
  one intra-block lane gather (``take_along_axis``, a hardware shuffle) to
  replicate -- no scatter, no scan, no random access;
* the 128-alignment pass is a monotonic gather whose source indices
  advance by exactly 1 inside a tile, handled the same way.

This is the TPU counterpart of the reference's prefix-sum + scatter
emission (binning.cu:33-110) and its gather-at-render of point attributes.
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLK = 128
INT_BIG = jnp.int32(2**31 - 128)


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def owner_of_slots(cum, slots):
    """owner(slot) = first i with cum[i] > slot, via a branchless binary
    search (few queries -- one per 128-slot block -- so the gather loop is
    cheap here, unlike at full entry scale)."""
    n = cum.shape[0]
    steps = max(1, math.ceil(math.log2(n + 1)))
    lo = jnp.zeros_like(slots, dtype=jnp.int32)
    hi = jnp.full_like(slots, n, dtype=jnp.int32)
    for _ in range(steps):
        mid = (lo + hi) >> 1
        mid_val = jnp.take(cum, jnp.clip(mid, 0, n - 1))
        go_right = (mid_val <= slots) & (lo < hi)
        lo = jnp.where(go_right, mid + 1, lo)
        hi = jnp.where(go_right | (lo >= hi), hi, mid)
    return jnp.minimum(lo, n - 1)


def _window_gather(attrs0, attrs1, idx):
    """out[:, j] = window[:, idx[0, j]] for a 256-wide window given as two
    128-lane halves.  Mosaic's hardware lane gather is limited to one vreg
    (128 lanes) along the gathered dimension, so gather each half and
    select."""
    a = attrs0.shape[0]
    i0 = jnp.broadcast_to(jnp.clip(idx, 0, BLK - 1), (a, BLK))
    i1 = jnp.broadcast_to(jnp.clip(idx - BLK, 0, BLK - 1), (a, BLK))
    g0 = jnp.take_along_axis(attrs0, i0, axis=1)
    g1 = jnp.take_along_axis(attrs1, i1, axis=1)
    return jnp.where(jnp.broadcast_to(idx < BLK, (a, BLK)), g0, g1)


def _expand_kernel(blo_ref, attrs0, attrs1, starts0, starts1,
                   out_ref, rank_ref):
    b = pl.program_id(0)
    slots = (b * BLK
             + jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1))  # [1,128]
    starts = jnp.concatenate([starts0[:, :], starts1[:, :]],
                             axis=0)       # [256, 1] window of item starts
    leq = starts <= slots                  # [256, 128]
    cnt = jnp.sum(leq.astype(jnp.int32), axis=0, keepdims=True)   # [1,128]
    owner_local = jnp.clip(cnt - 1, 0, 2 * BLK - 1)
    start_at = jnp.max(jnp.where(leq, jnp.broadcast_to(starts, leq.shape),
                                 jnp.int32(-1)), axis=0, keepdims=True)
    rank_ref[:, :] = slots - start_at
    out_ref[:, :] = _window_gather(attrs0[:, :], attrs1[:, :], owner_local)


@functools.partial(jax.jit, static_argnames=("out_len", "interpret"))
def expand_attrs(attrs, counts, out_len: int, interpret: bool = False):
    """Replicate per-item attribute rows into flat expansion slots.

    Args:
      attrs:  [A, S] f32 per-item rows (A a multiple of 8).
      counts: [S] int32 per-item slot counts.  Items with count > 0 MUST
        form a contiguous prefix (the callers sort empties to the tail).
      out_len: static output slots (multiple of 128).
    Returns:
      (out [A, out_len], rank [out_len] int32, total scalar int32).
      Slots past ``total`` hold arbitrary values; callers mask.
    """
    a, s = attrs.shape
    counts = jax.lax.optimization_barrier(counts.astype(jnp.int32))
    cum = jnp.cumsum(counts)
    total = cum[-1]
    starts = cum - counts
    nb = out_len // BLK
    blk_lo = owner_of_slots(cum, jnp.arange(nb, dtype=jnp.int32) * BLK)
    # lookahead guard -- see expand_attrs_windowed
    blk_lo = jnp.concatenate([blk_lo, blk_lo[-1:]])

    s_pad = _round_up(s, BLK) + 2 * BLK
    attrs_p = jnp.pad(attrs, ((0, 0), (0, s_pad - s)))
    # pad starts with INT_BIG so window counts ignore the dead tail
    starts_t = jnp.pad(starts, (0, s_pad - s),
                       constant_values=INT_BIG)[:, None]   # [s_pad, 1]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((a, BLK), lambda b, lo: (0, lo[b] // BLK),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, BLK), lambda b, lo: (0, lo[b] // BLK + 1),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 1), lambda b, lo: (lo[b] // BLK, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((BLK, 1), lambda b, lo: (lo[b] // BLK + 1, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((a, BLK), lambda b, lo: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, BLK), lambda b, lo: (0, b),
                         memory_space=pltpu.VMEM),
        ),
    )
    out, rank = pl.pallas_call(
        _expand_kernel,
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((a, out_len), jnp.float32),
                   jax.ShapeDtypeStruct((1, out_len), jnp.int32)),
        interpret=interpret,
    )(blk_lo, attrs_p, attrs_p, starts_t, starts_t)
    return out, rank[0], total


def _window_gather_k(blocks, idx, nblk: int):
    """out[:, j] = window[:, idx[0, j]] for an (nblk*128)-wide window given
    as nblk 128-lane pieces.  Mosaic's hardware lane gather only lowers in
    the self-shaped one-vreg form (indices.shape == operand.shape == [a,
    128] -- lowering.py asserts indices == operand shape + (1,)), so the
    slots axis is processed in 128-lane chunks, each gathering from every
    window block and selecting by index range."""
    a = blocks[0].shape[0]
    w = idx.shape[1]
    assert w % BLK == 0
    outs = []
    for c in range(0, w, BLK):
        idx_c = jnp.broadcast_to(idx[:, c:c + BLK], (a, BLK))
        out_c = jnp.take_along_axis(
            blocks[0], jnp.clip(idx_c, 0, BLK - 1), axis=1)
        for k in range(1, nblk):
            g = jnp.take_along_axis(
                blocks[k], jnp.clip(idx_c - k * BLK, 0, BLK - 1), axis=1)
            out_c = jnp.where(idx_c >= k * BLK, g, out_c)
        outs.append(out_c)
    return jnp.concatenate(outs, axis=1)


def _expand_kernel_w(blo_ref, *refs, nblk: int, slots: int):
    """Windowed expansion: nblk attr blocks + nblk start blocks in, one
    [A, slots] out block + ranks."""
    attr_blocks = refs[:nblk]
    start_blocks = refs[nblk:2 * nblk]
    out_ref, rank_ref = refs[2 * nblk], refs[2 * nblk + 1]
    b = pl.program_id(0)
    slot0 = b * slots
    slot_ids = (slot0
                + jax.lax.broadcasted_iota(jnp.int32, (1, slots), 1))
    starts = jnp.concatenate([s[:, :] for s in start_blocks],
                             axis=0)                    # [nblk*128, 1]
    leq = starts <= slot_ids                            # [nblk*128, slots]
    cnt = jnp.sum(leq.astype(jnp.int32), axis=0, keepdims=True)
    owner_local = jnp.clip(cnt - 1, 0, nblk * BLK - 1)
    start_at = jnp.max(jnp.where(leq, jnp.broadcast_to(starts, leq.shape),
                                 jnp.int32(-1)), axis=0, keepdims=True)
    rank_ref[:, :] = slot_ids - start_at
    out_ref[:, :] = _window_gather_k([a[:, :] for a in attr_blocks],
                                     owner_local, nblk)


@functools.partial(jax.jit, static_argnames=("out_len", "window_items",
                                             "slots_per_step", "interpret",
                                             "dma"))
def expand_attrs_windowed(attrs, counts, out_len: int,
                          window_items: int = 256,
                          slots_per_step: int = 256,
                          interpret: bool = False,
                          dma: bool = None):
    """Replicate per-item attribute rows into flat expansion slots, with a
    parametric item window and multi-block output steps.

    Unlike :func:`expand_attrs`, zero-count items may appear ANYWHERE (the
    owner decode skips them); the guarantee is instead checked: ``ok`` is
    False iff some output step's owners span more than the window covers
    (callers treat !ok as overflow -- the step no-ops and is retried, the
    same never-truncate discipline as capacity overflow).  With counts > 0
    forming a contiguous prefix, window_items=256 is strictly sufficient.

    Args:
      attrs:  [A, S] f32 per-item rows (A a multiple of 8).
      counts: [S] int32 per-item slot counts (>= 0).
      out_len: static output slots (multiple of slots_per_step).
      window_items: static item-window width (multiple of 128).
      slots_per_step: output slots per grid step (multiple of 128).
    Returns:
      (out [A, out_len], rank [out_len] int32, total scalar int32,
       ok scalar bool).  Slots past ``total`` hold arbitrary values.
    """
    from . import scan as _scan
    import os as _os
    if dma is None:
        dma = _os.environ.get("LITEGS_STREAM_DMA", "0") == "1"
    a, s = attrs.shape
    assert a % 8 == 0 and out_len % slots_per_step == 0
    assert window_items % BLK == 0
    nblk = window_items // BLK + 1     # +1 covers unaligned window starts
    counts = jax.lax.optimization_barrier(counts.astype(jnp.int32))
    cum = _scan.cumsum(counts)
    total = cum[-1]
    starts = cum - counts
    nsteps = out_len // slots_per_step
    step0 = jnp.arange(nsteps, dtype=jnp.int32) * slots_per_step
    # clamp queries to the live slot range: slots past `total` have no
    # owner (owner_of_slots would return the padded tail) and their output
    # is arbitrary by contract
    last_live = jnp.maximum(total - 1, 0)
    blk_lo = owner_of_slots(cum, jnp.minimum(step0, last_live))
    blk_hi = owner_of_slots(
        cum, jnp.minimum(step0 + (slots_per_step - 1), last_live))
    # the window anchored at floor(lo/128)*128 spans nblk*128 items
    ok = jnp.all(blk_hi - blk_lo <= (nblk - 1) * BLK)
    # LOOKAHEAD GUARD: the Mosaic pipeline evaluates the dynamic block
    # index maps one grid step AHEAD to prefetch; at the last step that
    # reads prefetch slot [nsteps] -- one past the array.  The garbage
    # scalar becomes a DMA base offset, which lands harmlessly inside a
    # neighboring allocation for most heap layouts and INVALID_ARGUMENTs
    # for others (the round-4 "standalone-green, in-step fault" mystery:
    # whether it crashed depended on what the allocator placed after the
    # buffer, i.e. on which OTHER executables had run first).  One
    # trailing sentinel makes the lookahead read defined.
    blk_lo = jnp.concatenate([blk_lo, blk_lo[-1:]])

    s_pad = _round_up(s, BLK) + (nblk + 1) * BLK
    attrs_p = jnp.pad(attrs, ((0, 0), (0, s_pad - s)))
    starts_t = jnp.pad(starts, (0, s_pad - s),
                       constant_values=INT_BIG)[:, None]   # [s_pad, 1]

    _fake = _os.environ.get("LITEGS_STREAM_FAKE")
    if _fake:
        # bisect aid: run parts of the XLA-side prelude but SKIP the
        # pallas kernel -- fake outputs keep the selected prelude ops
        # live.  Level "1" keeps everything (proved the kernel INNOCENT:
        # the prelude alone faults); "2" keeps only the attrs pad
        # materialization; "3" keeps only the owner_of_slots searches.
        dep = jnp.float32(0.0)
        if _fake in ("1", "2"):
            dep = dep + attrs_p[0, -1] * 0.0
        if _fake == "2":
            # sever owner_of_slots COMPLETELY: `ok` normally keeps the
            # binary searches live through the overflow flag
            ok = jnp.bool_(True)
        if _fake in ("1", "3"):
            dep = dep + (blk_lo[-1] * 0).astype(jnp.float32) \
                + (blk_hi[-1] * 0).astype(jnp.float32)
        out = jnp.zeros((a, out_len), jnp.float32) + dep
        rank = jnp.zeros((out_len,), jnp.int32) + dep.astype(jnp.int32)
        return out, rank, total, ok

    if dma:
        # fully-DMA path: ONE [a_pad, window] async copy per step carries
        # attrs AND the starts row; zero dynamic input index maps
        w = nblk * BLK
        a_pad = _round_up(a + 1, 8)
        starts_row = jnp.pad(
            starts, (0, s_pad - s),
            constant_values=INT_BIG).astype(jnp.float32)[None, :]
        attrs_aug = jnp.concatenate(
            [attrs_p, starts_row,
             jnp.zeros((a_pad - a - 1, s_pad), jnp.float32)], axis=0)
        grid_spec = pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nsteps,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
            out_specs=(
                pl.BlockSpec((a, slots_per_step), lambda b, lo: (0, b),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, slots_per_step), lambda b, lo: (0, b),
                             memory_space=pltpu.VMEM),
            ),
            scratch_shapes=[
                pltpu.VMEM((a_pad, w), jnp.float32),
                pltpu.SemaphoreType.DMA,
            ],
        )
        out, rank = pl.pallas_call(
            functools.partial(_expand_kernel_dma, nblk=nblk,
                              slots=slots_per_step, a_rows=a),
            grid_spec=grid_spec,
            out_shape=(jax.ShapeDtypeStruct((a, out_len), jnp.float32),
                       jax.ShapeDtypeStruct((1, out_len), jnp.int32)),
            interpret=interpret,
        )(blk_lo, attrs_aug)
        return out, rank[0], total, ok

    in_specs = (
        [pl.BlockSpec((a, BLK),
                      (lambda b, lo, _k=k: (0, lo[b] // BLK + _k)),
                      memory_space=pltpu.VMEM) for k in range(nblk)]
        + [pl.BlockSpec((BLK, 1),
                        (lambda b, lo, _k=k: (lo[b] // BLK + _k, 0)),
                        memory_space=pltpu.VMEM) for k in range(nblk)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nsteps,),
        in_specs=in_specs,
        out_specs=(
            pl.BlockSpec((a, slots_per_step), lambda b, lo: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, slots_per_step), lambda b, lo: (0, b),
                         memory_space=pltpu.VMEM),
        ),
    )
    out, rank = pl.pallas_call(
        functools.partial(_expand_kernel_w, nblk=nblk,
                          slots=slots_per_step),
        grid_spec=grid_spec,
        out_shape=(jax.ShapeDtypeStruct((a, out_len), jnp.float32),
                   jax.ShapeDtypeStruct((1, out_len), jnp.int32)),
        interpret=interpret,
    )(blk_lo, *([attrs_p] * nblk), *([starts_t] * nblk))
    return out, rank[0], total, ok


def _expand_kernel_dma(blo_ref, attrs_hbm, out_ref, rank_ref,
                       attrs_v, sem_a, *, nblk: int, slots: int,
                       a_rows: int):
    """Fully-DMA variant of _expand_kernel_w: ONE async copy fetches the
    whole [a_pad, w] window (attrs + the per-item start offsets riding as
    f32 row ``a_rows``) at a dynamic 128-aligned lane offset -- no
    dynamic input index maps at all (the construct behind the r4 in-step
    fault).  The lane-major starts row is transposed to [w, 1] with an
    exact MXU identity contraction (starts < 2^24 are exact in f32, and
    0/1 identity entries are exact in bf16, so HIGHEST-precision dot is
    bit-exact)."""
    b = pl.program_id(0)
    w = nblk * BLK
    w0 = (blo_ref[b] // BLK) * BLK
    cp_a = pltpu.make_async_copy(attrs_hbm.at[:, pl.ds(w0, w)], attrs_v,
                                 sem_a)
    cp_a.start()
    slot_ids = (b * slots
                + jax.lax.broadcasted_iota(jnp.int32, (1, slots), 1))
    slot_f = slot_ids.astype(jnp.float32)
    cp_a.wait()
    starts_row = attrs_v[a_rows:a_rows + 1, :]          # [1, w] f32 ints
    # MXU transpose: out[i, 0] = sum_j I[i, j] * starts_row[0, j]
    ri = jax.lax.broadcasted_iota(jnp.int32, (w, w), 0)
    ci = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    ident = (ri == ci).astype(jnp.float32)
    starts = jax.lax.dot_general(
        ident, starts_row, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
        precision=jax.lax.Precision.HIGHEST)            # [w, 1]
    leq = starts <= slot_f                              # [w, slots]
    cnt = jnp.sum(leq.astype(jnp.int32), axis=0, keepdims=True)
    owner_local = jnp.clip(cnt - 1, 0, w - 1)
    start_at = jnp.max(jnp.where(leq, jnp.broadcast_to(starts, leq.shape),
                                 -1.0), axis=0, keepdims=True)
    rank_ref[:, :] = slot_ids - start_at.astype(jnp.int32)
    out_ref[:, :] = _window_gather_k(
        [attrs_v[:a_rows, k * BLK:(k + 1) * BLK] for k in range(nblk)],
        owner_local, nblk)


def _monotonic_kernel(slo_ref, attrs0, attrs1, out_ref):
    b = pl.program_id(0)
    src_lo = slo_ref[b]
    w0 = (src_lo // BLK) * BLK
    local = (src_lo - w0
             + jax.lax.broadcasted_iota(jnp.int32, (1, BLK), 1))  # [1,128]
    out_ref[:, :] = _window_gather(attrs0[:, :], attrs1[:, :],
                                   jnp.clip(local, 0, 2 * BLK - 1))


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_blocks(attrs, src_lo, interpret: bool = False):
    """Gather 128-wide runs: out[:, 128b+j] = attrs[:, src_lo[b]+j].

    The 128-alignment pass of the binning table is exactly this shape (each
    aligned block reads one tile's consecutive unaligned entries).
    """
    a, s = attrs.shape
    nb = src_lo.shape[0]
    s_pad = _round_up(s, BLK) + 2 * BLK
    attrs_p = jnp.pad(attrs, ((0, 0), (0, s_pad - s)))
    src_lo = jnp.clip(src_lo.astype(jnp.int32), 0, s - 1)
    # lookahead guard -- see expand_attrs_windowed
    src_lo = jnp.concatenate([src_lo, src_lo[-1:]])

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((a, BLK), lambda b, lo: (0, lo[b] // BLK),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((a, BLK), lambda b, lo: (0, lo[b] // BLK + 1),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((a, BLK), lambda b, lo: (0, b),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _monotonic_kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((a, nb * BLK), jnp.float32),
        interpret=interpret,
    )(src_lo, attrs_p, attrs_p)
