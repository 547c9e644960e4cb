"""Pallas TPU rasterizer: tile-binned alpha compositing, forward + backward.

This is the TPU-native re-design of the reference CUDA rasterizer
(raster.cu:161-332 forward, 599-853 backward).  The CUDA kernel maps one
warp to a tile and walks the depth-sorted gaussian list with per-thread
register blending and forward-difference exponent evaluation; none of that
structure survives on a TPU.  Instead, everything becomes dense linear
algebra on (gaussian-block x pixel) matrices that the MXU eats:

* A tile is tile_h x tile_w = 128 pixels -> the 128-lane minor axis.
* Gaussians are processed in depth-ordered blocks of G=128 (sublanes).
* The alpha exponent is a *bilinear form*: with pixel features
  h(p) = [1, x, y, x^2, xy, y^2] and per-gaussian coefficients f(g)
  (quadratic expanded around the tile origin to keep f32 exact),
  Q[g, p] = f(g) . h(p) -- one [128,6]x[6,128] MXU matmul per block,
  replacing the CUDA forward-difference trick (raster.cu:237-257).
* Opacity is folded into the exponent (alpha = exp(-0.5 Q + ln o)), so no
  per-gaussian broadcast across lanes is ever needed.
* The sequential front-to-back transmittance recursion becomes a
  *cumulative product along sublanes* of (1 - alpha), computed as a
  log-step shift-multiply scan (_cumprod_excl_g) -- no transcendentals.
* Color accumulation is C[4, G] @ W[G, 128] -- MXU.
* The backward pass re-walks blocks in the same (forward) order using the
  saved per-pixel final color and transmittance: with
  S_i = C_total - prefix_i the suffix color,
  dL/dalpha_i = (c_i . dC) T_i - (dC . S_i + T_fin dT)/(1 - alpha_i),
  which is the same analytic form the CUDA backward computes back-to-front
  (raster.cu:758-774).  Per-gaussian gradients leave the kernel as six
  *moments* sum_p dq [1,x,y,x^2,xy,y^2] (one [128,128]x[128,6] matmul)
  plus color/stat sums; the tiny per-entry conversion to
  (d_invcov, d_mean, d_opacity) and the scatter-reduction to points happen
  outside in jnp (segment_sum) -- the TPU replacement for the CUDA
  atomicAdd accumulation (raster.cu:794-849).

The reference's fp16 workarounds (x128 transmittance scaling, gradient
max-normalization, raster.cu:180,490) are unnecessary in f32 and dropped;
the *algorithmic* thresholds (alpha in [1/256, 255/256], stop at
T <= 1/8192) are kept exactly -- they are semantics, not workarounds.
"""
from __future__ import annotations

import functools
import math
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import RASTER_BLOCK, RASTER_MXU_MODE
from .raster_jnp import ALPHA_MAX, ALPHA_MIN, T_MIN

G_BLK = RASTER_BLOCK  # gaussians per block (sublane-major)
N_PIX = 128          # default pixels/tile; kernels support any multiple
                     # of 128 (e.g. 256 for the reference's 16x16 tiles)
PAR_ROWS = 16        # packed per-entry parameter rows
OUT_ROWS = 8         # output tile rows: rgb, depth, T, (3 spare)
GRAD_ROWS = 16       # per-entry gradient rows emitted by the backward
NEG_BIG = 60.0       # -0.5*Q' for padded entries => alpha ~ exp(-30)

# MXU offload mode: which blend-math stages run as MXU matmuls instead of
# VPU broadcast/reduce passes (measured per-stage on-chip by
# scripts/microbench_mxu.py; see PERF.md r4).  One flag char per stage:
#   q: alpha quadratic F[8,G].T @ H[8,P]           (fwd + bwd)
#   c: transmittance cumprod as exp(Ltri @ log1p)  (fwd + bwd)
#   a: color accumulation C[4,G] @ W[G,P]          (fwd)
#   s: suffix cumsum Ltri @ u                      (bwd)
#   g: g1 = colors.T @ d_col                       (bwd)
#   d: d_color / w_sum = d_col @ W.T               (bwd)
#   m: dq moments H @ dq.T                         (bwd)
MXU_MODE = RASTER_MXU_MODE

# exp by explicit exponent construction (see _fast_exp).  MEASURED
# SLOWER on-chip (fwd 48.8 vs 43.8 ms, bwd 61.5 vs 55.7 -- the builtin
# transcendental already beats a hand-rolled Horner + int/bitcast
# construction on this VPU; PERF.md r5 #7).  Kept gated OFF as the
# recorded negative result so the next optimizer doesn't redo it; the
# remaining kernel lever is evaluating exp on FEWER elements.
import os as _os
FAST_EXP = _os.environ.get("LITEGS_FAST_EXP", "0") == "1"

_HI = "highest"   # native 6-pass (Mosaic supports DEFAULT and HIGHEST only)
_MED = "split3"   # manual 3-pass bf16 split (XLA's HIGH, which Mosaic lacks)


def _dot(lhs, rhs, dims, precision=jax.lax.Precision.DEFAULT):
    return jax.lax.dot_general(
        lhs, rhs, dimension_numbers=((
            (dims[0],), (dims[1],)), ((), ())),
        preferred_element_type=jnp.float32, precision=precision)


def _bf16_split(x, terms: int):
    """x (f32) -> [terms] bf16 arrays summing to x to ~8*terms mantissa
    bits (error-free transformation truncated at `terms`)."""
    parts = []
    for i in range(terms):
        p = x.astype(jnp.bfloat16)
        parts.append(p)
        if i + 1 < terms:
            x = x - p.astype(jnp.float32)
    return parts


def _mm(lhs, rhs, dims, precision):
    """Contract lhs dim dims[0] with rhs dim dims[1] on the MXU, f32 accum.

    precision _HI: native HIGHEST (compiler 3x3-term split, ~f32-exact).
    precision _MED: manual 3-matmul split (lhs_hi*rhs_hi + lhs_hi*rhs_lo +
    lhs_lo*rhs_hi) -- products to ~2^-17 relative, the Mosaic-compatible
    replacement for XLA's Precision.HIGH.
    """
    if precision == _HI:
        return _dot(lhs, rhs, dims, jax.lax.Precision.HIGHEST)
    lh, ll = _bf16_split(lhs, 2)
    rh, rl = _bf16_split(rhs, 2)
    return (_dot(lh, rh, dims) + _dot(lh, rl, dims) + _dot(ll, rh, dims))


def _mm_exact_lhs(lhs_exact, rhs, dims, terms: int):
    """MXU contraction where lhs is EXACT in bf16 (0/1 triangular masks):
    only rhs splits -- `terms` matmuls capture ~8*terms bits of rhs."""
    l16 = lhs_exact.astype(jnp.bfloat16)
    return sum(_dot(l16, r, dims) for r in _bf16_split(rhs, terms))


def _ltri(n: int, strict: bool):
    """[n, n] lower-triangular ones (cumsum-as-matmul operator)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    return ((c < r) if strict else (c <= r)).astype(jnp.float32)


def _pixel_features(tile_h: int, tile_w: int):
    """h(p) = [1, x, y, x^2, xy, y^2] in tile-local coords, as
    H [8, P] (sublane-padded) and Hm [P, 8]."""
    npix = tile_h * tile_w
    p = jax.lax.broadcasted_iota(jnp.int32, (1, npix), 1)
    x = (p % tile_w).astype(jnp.float32)
    y = (p // tile_w).astype(jnp.float32)
    one = jnp.ones_like(x)
    zero = jnp.zeros_like(x)
    h = jnp.concatenate([one, x, y, x * x, x * y, y * y, zero, zero], axis=0)
    pm = jax.lax.broadcasted_iota(jnp.int32, (npix, 1), 0)
    xm = (pm % tile_w).astype(jnp.float32)
    ym = (pm // tile_w).astype(jnp.float32)
    onem = jnp.ones_like(xm)
    zerom = jnp.zeros_like(xm)
    hm = jnp.concatenate([onem, xm, ym, xm * xm, xm * ym, ym * ym,
                          zerom, zerom], axis=1)
    return h, hm


def _cumsum_g(x):
    """Inclusive cumsum along the gaussian (sublane) axis: log-step
    shifted adds (Mosaic has no cumsum lowering); exact f32."""
    n = x.shape[0]
    k = 1
    while k < n:
        x = x + jnp.pad(x, ((k, 0), (0, 0)))[:n]
        k *= 2
    return x


def _cumprod_excl_g(x):
    """EXCLUSIVE cumprod along the gaussian axis: log-step shifted
    multiplies.  Replaces exp(cumsum(log1p(-alpha))) for the
    transmittance recursion -- two [G, P] transcendentals per block
    gone; the shifted-tree association order differs from a sequential
    product only in f32 rounding (the CUDA reference multiplies
    sequentially, raster.cu:262-282; the jnp oracle cross-checks within
    tolerance)."""
    n = x.shape[0]
    x = jnp.pad(x, ((1, 0), (0, 0)), constant_values=1.0)[:n]  # shift in a 1
    k = 1
    while k < n:
        x = x * jnp.pad(x, ((k, 0), (0, 0)), constant_values=1.0)[:n]
        k *= 2
    return x


_LOG2E = 1.4426950408889634
# ln2^k / k!  (degree-5 Taylor of 2^f on |f| <= 0.5: truncation error
# ~3.4e-6 relative -- well inside the 1e-4 on-chip parity bars)
_EXP_C = (1.0, 0.6931471805599453, 0.2402265069591007,
          0.05550410866482158, 0.009618129107628477,
          0.0013333558146428443)


def _fast_exp(x):
    """exp(x) by explicit exponent construction: ~12 cheap VPU ops
    against the builtin's polynomial ladder (the stage ablation puts the
    builtin at HALF of each kernel, PERF.md r5 #7).

    exp(x) = 2^i * 2^f with t = x*log2e, i = round(t), f = t - i; the
    2^i factor is built by writing (i+127) into the f32 exponent bits.
    The exponent clamp at -126 keeps every constructed value NORMAL --
    the TPU denormal-flush hazard (CLAUDE.md invariant) cannot trigger,
    and anything that WOULD have been subnormal is < 2^-126, far below
    the alpha >= 1/256 threshold that zeroes it anyway.  Accuracy
    ~4e-6 relative; NaN/garbage inputs land at the clamp and threshold
    to zero exactly like the builtin path."""
    t = x * _LOG2E
    i = jnp.floor(t + 0.5)
    f = t - i
    p = _EXP_C[5]
    for c in (_EXP_C[4], _EXP_C[3], _EXP_C[2], _EXP_C[1], _EXP_C[0]):
        p = p * f + c
    ic = jnp.clip(i, -126.0, 126.0).astype(jnp.int32)
    scale = jax.lax.bitcast_convert_type(
        jax.lax.shift_left(ic + 127, 23), jnp.float32)
    return p * scale


def _block_alpha(params_blk, h_feat, count_left, mxu_q: bool = False,
                 ablate: str = ""):
    """alpha (clamped+thresholded) and raw exp for one gaussian block.

    params_blk: [16, G] packed rows (see pack_entry_params).
    Returns (alpha_eff_preT [G, P], alpha_raw [G, P], thresh_ok [G, P]).

    ``mxu_q``: evaluate the quadratic as ONE [8,G].T@[8,P] MXU contraction
    at HIGHEST precision (the 6-pass bf16 split = f32-exact to ~2^-21 of
    the term magnitudes) instead of six VPU broadcast passes.  Rows 6..7 of
    params_blk are colors, but feature rows 6..7 are exact zeros so they
    contribute nothing.  Round-1's "~10% image error" data point was the
    DEFAULT (single-pass bf16) precision, not this.

    ``ablate``: microbench-only stage stubs for on-chip pass-count
    attribution (scripts/microbench_kernelstages.py) -- NOT a user knob;
    outputs are wrong under any ablation.  'Q' stubs the quadratic to one
    broadcast, 'E' stubs exp to an affine map.
    """
    if "Q" in ablate:
        # one-term form of the production pattern (6 -> 1 FMA passes)
        q = params_blk[0:1, :].T * h_feat[0:1, :]
    elif mxu_q:
        q = _mm(params_blk[0:8, :], h_feat, (0, 0), _HI)      # [G, P]
    else:
        q = 0.0
        for i in range(6):
            q = q + params_blk[i:i + 1, :].T * h_feat[i:i + 1, :]
    power = -0.5 * q                             # [G, P]; includes +ln(op)
    g_idx = jax.lax.broadcasted_iota(jnp.int32, (G_BLK, 1), 0)
    in_range = (g_idx < count_left)
    if "E" in ablate:
        alpha_raw = jnp.maximum(1.0 + 0.1 * power, 0.0)
    else:
        # The transcendental is HALF the forward kernel (~21 of 41.6 ms,
        # scripts/microbench_kernelstages.py r5 ablation) and is a
        # hardware floor, not a lowering artifact: exp2(x*log2e) measured
        # bit-neutral and time-neutral (41.55 vs 41.61 ms, PERF.md r5).
        # Pass-count work on the polynomial/scan stages cannot reach
        # <60 ms combined; only a cheaper exponential (or fewer exp
        # elements) can -- hence _fast_exp (gated, measured on-chip).
        if FAST_EXP:
            alpha_raw = _fast_exp(power)
        else:
            alpha_raw = jnp.exp(power)
    thresh_ok = (alpha_raw >= ALPHA_MIN) & in_range
    alpha = jnp.where(thresh_ok, jnp.minimum(alpha_raw, ALPHA_MAX), 0.0)
    return alpha, alpha_raw, thresh_ok


def _cumprod_excl(one_m, mxu: bool):
    """Exclusive cumprod of (1 - alpha) along the gaussian axis.

    VPU path: log-step shift-multiply scan (_cumprod_excl_g, ~14 passes).
    MXU path: exp(Lstrict @ log1p(-alpha)) -- one [G,G]@[G,P] matmul at
    HIGH precision (3-pass bf16 split) between two transcendental passes.
    one_m >= 1/256 always (alpha clamped at 255/256), so log1p is finite;
    padded entries have alpha == 0 -> log 0 -> factor 1 exactly.
    """
    if not mxu:
        return _cumprod_excl_g(one_m)
    lg = jnp.log(one_m)                          # finite: one_m >= 1/256
    # lhs is exact 0/1; 3 rhs terms capture log values to ~2^-24 relative
    return jnp.exp(_mm_exact_lhs(_ltri(G_BLK, strict=True), lg, (1, 0), 3))


# ---------------------------------------------------------------------------
# forward kernel
#
# Grid = one step per 128-entry BLOCK of the aligned table (not per tile):
# empty tiles cost nothing, Pallas pipelines the 8 KB block fetches itself
# (no manual DMA / while_loop), and per-grid-step overhead amortizes over
# real work only.  Blocks of one tile are consecutive; the out BlockSpec
# maps every block to its tile's output row (scalar-prefetched index map),
# so Pallas keeps the row in VMEM across the tile's blocks (revisiting) and
# the output row itself carries the blend state:
#   rows 0:4 = accumulated channels, 4 = effective transmittance,
#   5 = plain transmittance carry (zeroed after the tile's last block).
# ---------------------------------------------------------------------------

def _fwd_kernel(bt_ref, bc_ref, params_ref, out_ref, *, tile_h, tile_w,
                has_depth=True, mxu=MXU_MODE, ablate=""):
    b = pl.program_id(0)
    nb = pl.num_programs(0)
    tile = bt_ref[b]
    prev = bt_ref[jnp.maximum(b - 1, 0)]
    nxt = bt_ref[jnp.minimum(b + 1, nb - 1)]
    is_first = (b == 0) | (tile != prev)
    is_last = (b == nb - 1) | (tile != nxt)
    count_left = bc_ref[b]

    @pl.when(is_first)
    def _():
        npix = tile_h * tile_w
        out_ref[0, 0:4, :] = jnp.zeros((4, npix), jnp.float32)
        out_ref[0, 4:6, :] = jnp.ones((2, npix), jnp.float32)
        out_ref[0, 6:8, :] = jnp.zeros((2, npix), jnp.float32)

    # skip saturated pixels' blocks entirely (raster.cu:260 early-out)
    @pl.when((count_left > 0) & (jnp.max(out_ref[0, 4, :]) > T_MIN))
    def _():
        h_feat, _ = _pixel_features(tile_h, tile_w)
        t_plain = out_ref[0, 5:6, :]
        t_eff = out_ref[0, 4:5, :]
        pb = params_ref[:, :]
        alpha, _, _ = _block_alpha(pb, h_feat, count_left, "q" in mxu,
                                   ablate)

        # exclusive transmittance prefix along depth (VPU shift-multiply
        # scan or MXU triangular matmul, see _cumprod_excl)
        one_m = 1.0 - alpha                            # [G, P]
        if "C" in ablate:      # microbench stub: no prefix scan
            t_excl = t_plain * one_m
        else:
            t_excl = t_plain * _cumprod_excl(one_m, "c" in mxu)
        active = t_excl > T_MIN
        w = jnp.where(active, alpha * t_excl, 0.0)

        # skip the depth channel's accumulate pass when it is a known-zero
        # pad (nchan == 3): its output row stays at the is_first zeros
        nch = 4 if has_depth else 3
        colors = pb[6:6 + nch, :]                      # [nch, G] rgb[+depth]
        if "A" in ablate:      # microbench stub: no channel reduce
            acc = jnp.concatenate(
                [jnp.sum(w[0:8, :], axis=0, keepdims=True)] * nch, axis=0)
        elif "a" in mxu:
            acc = _mm(colors, w, (1, 0), _MED)         # [nch, P] MXU
        else:
            acc = jnp.concatenate(
                [jnp.sum(colors[c:c + 1, :].T * w, axis=0, keepdims=True)
                 for c in range(nch)], axis=0)         # [nch, P] VPU exact
        out_ref[0, 0:nch, :] += acc

        # effective (frozen) transmittance bookkeeping: the first plain
        # value <= T_MIN freezes (raster.cu:260-282 semantics)
        if "T" in ablate:      # microbench stub: carry only t_end
            t_end = t_excl[G_BLK - 1:G_BLK, :] * one_m[G_BLK - 1:G_BLK, :]
            out_ref[0, 4:5, :] = t_end
            out_ref[0, 5:6, :] = t_end
        else:
            t_incl = t_excl * one_m
            crossed = t_incl <= T_MIN
            first_below = jnp.max(jnp.where(crossed, t_incl, 0.0), axis=0,
                                  keepdims=True)
            t_end = t_incl[G_BLK - 1:G_BLK, :]
            any_crossed = jnp.any(crossed, axis=0, keepdims=True)
            out_ref[0, 4:5, :] = jnp.where(
                t_eff > T_MIN,
                jnp.where(any_crossed, first_below, t_end), t_eff)
            out_ref[0, 5:6, :] = t_end

    @pl.when(is_last)
    def _():
        out_ref[0, 5:8, :] = jnp.zeros((3, tile_h * tile_w), jnp.float32)


# ---------------------------------------------------------------------------
# backward kernel
#
# Same block grid as the forward.  Re-walks blocks in forward order using
# the saved per-tile output row (final color + transmittance): with suffix
# sums the analytic dL/dalpha matches the CUDA reverse-order walk
# (raster.cu:758-774).  The (t_plain, prefix) recursion carries across a
# tile's consecutive blocks in VMEM scratch; per-entry gradient rows stream
# out through a regular blocked out spec (no atomics -- the segment_sum to
# points happens outside).
# ---------------------------------------------------------------------------

def _bwd_kernel(bt_ref, bc_ref, params_ref, dtiles_hbm, grad_ref, carry,
                dt_vmem, dma_sem, *, tile_h, tile_w, has_depth=True,
                with_stats=True, mxu=MXU_MODE, ablate=""):
    b = pl.program_id(0)
    tile = bt_ref[b]
    prev = bt_ref[jnp.maximum(b - 1, 0)]
    is_first = (b == 0) | (tile != prev)
    count_left = bc_ref[b]

    @pl.when(is_first)
    def _():
        # Fetch THIS tile's cotangent row HBM -> VMEM once per tile (~20
        # consecutive blocks share it at 32x32 tiles).  The XLA-side
        # alternative -- pre-expanding to per-block [nb, 8, P] with a
        # row-gather -- materializes ~780 MB per step at bench scale; a
        # prefetch-dependent *input* index map is no better (10-80 us per
        # grid step, defeats pipelining).  An explicit DMA on tile change
        # moves exactly |T| * 32 KB total.
        dma = pltpu.make_async_copy(dtiles_hbm.at[tile], dt_vmem, dma_sem)
        dma.start()
        carry[0:1, :] = jnp.ones((1, tile_h * tile_w), jnp.float32)
        carry[1:2, :] = jnp.zeros((1, tile_h * tile_w), jnp.float32)
        dma.wait()

    grad_ref[:, :] = jnp.zeros((GRAD_ROWS, G_BLK), jnp.float32)

    # saturation early-out, mirroring the forward (raster.cu:260): once
    # every pixel's plain transmittance is below T_MIN, all remaining
    # blocks of the tile have w == 0 and d_alpha == 0 -- their gradient
    # rows stay at the zeros written above, and the carry can go stale
    # because t_plain only decreases (every later block skips too)
    @pl.when((count_left > 0) & (jnp.max(carry[0, :]) > T_MIN))
    def _():
        h_feat, _ = _pixel_features(tile_h, tile_w)
        d_col = dt_vmem[0:4, :]                      # [4, P] upstream dC
        d0 = dt_vmem[5:6, :]                         # [1, P] dC.C_tot+T dT
        t_plain = carry[0:1, :]
        prefix = carry[1:2, :]

        pb = params_ref[:, :]
        alpha, alpha_raw, thresh_ok = _block_alpha(pb, h_feat, count_left,
                                                   "q" in mxu, ablate)

        one_m = 1.0 - alpha
        if "C" in ablate:      # microbench stub
            t_excl = t_plain * one_m
        else:
            t_excl = t_plain * _cumprod_excl(one_m, "c" in mxu)
        ok = thresh_ok & (t_excl > T_MIN)
        w = jnp.where(ok, alpha * t_excl, 0.0)

        # skip the depth channel when it is a known-zero pad (nchan == 3):
        # d_col[3] == 0, so its g1 term and d_color row vanish
        nch = 4 if has_depth else 3
        colors = pb[6:6 + nch, :]                    # [nch, G]
        if "G" in ablate:      # microbench stub (one-term form)
            g1 = colors[0:1, :].T * d_col[0:1, :]
        elif "g" in mxu:
            g1 = _mm(colors, d_col[0:nch, :], (0, 0), _MED)  # [G, P]
        else:
            g1 = 0.0                                 # [G, P] (c_i . dC)
            for c in range(nch):
                g1 = g1 + colors[c:c + 1, :].T * d_col[c:c + 1, :]
        u = g1 * w
        if "S" in ablate:      # microbench stub
            cum_u = u
        elif "s" in mxu:
            cum_u = _mm_exact_lhs(_ltri(G_BLK, strict=False), u, (1, 0), 2)
        else:
            cum_u = _cumsum_g(u)
        p_incl = prefix + cum_u                      # [G, P] inclusive

        d_alpha = jnp.where(
            ok,
            g1 * t_excl - (d0 - p_incl) / (1.0 - alpha),
            0.0)
        # chain through alpha = exp(power): straight-through past the
        # 255/256 clamp, exactly like raster.cu:776-778
        dpw = d_alpha * jnp.where(ok, alpha_raw, 0.0)  # d/d(power)
        dq = -0.5 * dpw                                # d/d(quadratic)

        # per-entry reductions: [G, P]-to-per-entry sums, either explicit
        # VPU multiply-reduces or MXU contractions over the pixel axis
        zrow = jnp.zeros((1, G_BLK), jnp.float32)
        if "M" in ablate:      # microbench stub: 8-lane moments
            m0 = jnp.sum(dq[:, 0:8], axis=1)[None, :]
            mom_rows = [m0 for _ in range(6)]
            dlnop = jnp.sum(dpw[:, 0:8], axis=1)[None, :]
        elif "m" in mxu:
            mom8 = _mm(h_feat, dq, (1, 1), _MED)       # [8, G]; rows 6,7 = 0
            mom_rows = [mom8[i:i + 1, :] for i in range(6)]
            # sum(dpw) = -2 * sum(dq * 1) = -2 * moment 0 (h row 0 is ones)
            dlnop = -2.0 * mom8[0:1, :]
        else:
            mom_rows = [jnp.sum(dq * h_feat[i:i + 1, :], axis=1)[None, :]
                        for i in range(6)]             # 6 x [1, G]
            dlnop = jnp.sum(dpw, axis=1)[None, :]
        if with_stats:
            # fragment statistics (raster.cu:289-301,779-820): only
            # computed on statistics epochs -- three [G, P] reduce passes
            # the steady-state VJP skips
            cnt = jnp.sum(ok.astype(jnp.float32), axis=1)[None, :]
            err2 = jnp.sum(dpw * dpw, axis=1)[None, :]
        else:
            cnt, err2 = zrow, zrow
        if "D" in ablate:      # microbench stub
            d0 = jnp.sum(w[:, 0:8], axis=1)[None, :]
            d_color = jnp.concatenate([d0] * 4, axis=0)
            w_sum = zrow
        elif "d" in mxu:
            ones_row = jnp.ones((1, tile_h * tile_w), jnp.float32)
            dcw = _mm(jnp.concatenate([d_col[0:nch, :], ones_row], axis=0),
                      w, (1, 1), _MED)                 # [nch+1, G]
            d_color = jnp.concatenate(
                [dcw[0:nch]] + [zrow] * (4 - nch), axis=0)
            w_sum = dcw[nch:nch + 1] if with_stats else zrow
        else:
            d_color = jnp.concatenate(
                [jnp.sum(d_col[c:c + 1, :] * w, axis=1)[None, :]
                 for c in range(nch)]
                + [zrow] * (4 - nch), axis=0)          # [4, G]
            w_sum = (jnp.sum(w, axis=1)[None, :] if with_stats else zrow)
        grad_ref[:, :] = jnp.concatenate(
            [d_color] + mom_rows + [dlnop, w_sum, cnt, err2,
             jnp.zeros((2, G_BLK), jnp.float32)], axis=0)

        carry[0:1, :] = t_excl[G_BLK - 1:G_BLK, :] * one_m[G_BLK - 1:G_BLK, :]
        carry[1:2, :] = p_incl[G_BLK - 1:G_BLK, :]


# ---------------------------------------------------------------------------
# host-side wrappers
# ---------------------------------------------------------------------------

class PackedEntries(NamedTuple):
    params: jax.Array       # [16, E + 128] per-entry packed rows
    mu_local: jax.Array     # [2, E] tile-local means
    tile_origin: jax.Array  # [2, E] tile origin in pixels


def pack_entry_params(mean_pix, inv_cov, color, opacity, depth,
                      sorted_point, sorted_tile, entry_valid,
                      tiles_x: int, tile_h: int, tile_w: int,
                      tiles_y: int = 0):
    """Gather per-point attributes to table entries and expand the alpha
    quadratic around each entry's tile origin (f32-exact local frame).

    Row layout (PAR_ROWS=16):
      0..5: quadratic coeffs vs [1, x, y, x^2, xy, y^2] with -2 ln(opacity)
            folded into row 0;  6,7 pad (zero)
      6..9: r, g, b, depth   (colors overwrite the pad rows 6,7 -- rows are
            0:f1 1:fx 2:fy 3:fxx 4:fxy 5:fyy, colors live at 6..9)
      10,11: tile-local mu_x, mu_y;  12,13,14: a, b, c;  15: opacity
    """
    # ONE [M, 10] row-gather fetches every per-point attribute per entry:
    # measured ~6x cheaper than per-attribute 1-D gathers (the per-index
    # overhead dominates; scripts/microbench_r2.py rowgather_Mx8 82 ms vs
    # gather1d_x8 501 ms at 4.8M entries)
    cols = [mean_pix[0], mean_pix[1], inv_cov[0], inv_cov[1], inv_cov[2],
            jnp.maximum(opacity, 1e-12), color[0], color[1], color[2]]
    cols.append(jnp.zeros_like(opacity) if depth is None else depth)
    tab = jnp.stack(cols, axis=1)                       # [M, 10]
    f = jnp.take(tab, sorted_point, axis=0).T           # [10, E]

    # tiles_y > 0: batched tables (binning.concat_tables) place view v's
    # tiles at [v*T, (v+1)*T); the tile ORIGIN is per-view, so the row
    # index wraps modulo tiles_y (a no-op for single-view tables)
    row_idx = sorted_tile // tiles_x
    if tiles_y > 0:
        row_idx = row_idx % tiles_y
    ox = ((sorted_tile % tiles_x) * tile_w).astype(jnp.float32)
    oy = (row_idx * tile_h).astype(jnp.float32)
    mx = f[0] - ox
    my = f[1] - oy
    a, b, c = f[2], f[3], f[4]
    op = f[5]
    f1 = (a * mx * mx + 2 * b * mx * my + c * my * my
          - 2.0 * jnp.log(op))
    f1 = jnp.where(entry_valid, f1, 2.0 * NEG_BIG)
    fx = -2.0 * (a * mx + b * my)
    fy = -2.0 * (b * mx + c * my)
    rows = [f1, fx, fy, a, 2.0 * b, c,
            f[6], f[7], f[8], f[9],
            mx, my, a, b, c, op]
    params = jnp.stack(rows, axis=0)
    params = jnp.pad(params, ((0, 0), (0, G_BLK)))
    return PackedEntries(params=params, mu_local=jnp.stack([mx, my]),
                         tile_origin=jnp.stack([ox, oy]))


def moments_to_grads(grads16, mu_local, inv_cov_e, opacity_e):
    """Per-entry gradient rows -> per-entry parameter gradients.

    grads16: [16, E] backward-kernel output
       (0..3 d_color, 4..9 moments M00,M10,M01,M20,M11,M02 of dq,
        10 d_lnop_sum(dpw), 11 w_sum, 12 count, 13 err^2).
    Returns dict of per-entry grads ready for segment_sum by point.
    """
    m00, m10, m01 = grads16[4], grads16[5], grads16[6]
    m20, m11, m02 = grads16[7], grads16[8], grads16[9]
    mx, my = mu_local[0], mu_local[1]
    a, b, c = inv_cov_e[0], inv_cov_e[1], inv_cov_e[2]
    d_a = mx * mx * m00 - 2 * mx * m10 + m20
    d_b = 2 * (mx * my * m00 - mx * m01 - my * m10 + m11)
    d_c = my * my * m00 - 2 * my * m01 + m02
    d_mx = 2 * a * (mx * m00 - m10) + 2 * b * (my * m00 - m01)
    d_my = 2 * b * (mx * m00 - m10) + 2 * c * (my * m00 - m01)
    d_op = grads16[10] / jnp.maximum(opacity_e, 1e-12)
    return {
        "d_color": grads16[0:4],
        "d_invcov": jnp.stack([d_a, d_b, d_c]),
        "d_mean": jnp.stack([d_mx, d_my]),
        "d_opacity": d_op,
        "w_sum": grads16[11],
        "count": grads16[12],
        "err2": grads16[13],
    }


def block_tables(table, tiles_total: int):
    """Per-block (tile id, entries remaining) from the aligned table.

    Block b covers entry slots [128b, 128b+128), all one tile (the binning
    128-aligns segments); padding blocks get tile id == tiles_total and
    count 0 so the kernels skip them and their output lands in a dummy row.
    """
    bt = table.sorted_tile[::G_BLK].astype(jnp.int32)        # [B]
    safe = jnp.minimum(bt, tiles_total - 1)
    start = jnp.take(table.tile_start, safe)
    cnt = jnp.take(table.tile_count, safe)
    boff = jnp.arange(bt.shape[0], dtype=jnp.int32) * G_BLK
    cnt_left = jnp.where(bt < tiles_total, cnt - (boff - start), 0)
    return bt, jnp.maximum(cnt_left, 0).astype(jnp.int32)


@functools.partial(jax.jit, static_argnames=("tiles_total", "tile_h",
                                             "tile_w", "interpret",
                                             "has_depth", "mxu", "ablate"))
def raster_forward_pallas(params, block_tile, block_cnt,
                          tiles_total: int, tile_h: int, tile_w: int,
                          interpret: bool = False, has_depth: bool = True,
                          mxu: str = MXU_MODE, ablate: str = ""):
    """Run the forward kernel.

    Returns out_tiles [T + 1, 8, 128]; rows of tiles with no entries are
    UNINITIALIZED (the block grid never visits them) and row T is the
    padding dump -- callers mask with tile_count (see ops/raster.py).
    """
    nb = block_tile.shape[0]
    # LOOKAHEAD SENTINEL: the out index map is scalar-prefetch-dependent
    # (bt[b]); Mosaic's pipeline evaluates dynamic block index maps one
    # grid step AHEAD, so the last step reads bt[nb] -- one past the
    # array.  The garbage value becomes an output-DMA block offset into
    # the [T+1, ...] buffer: an out-of-bounds WRITE whose victim depends
    # on what the allocator placed after it (the round-4/5 "stream branch
    # faults only after another executable ran" mystery -- see
    # stream_gather.expand_attrs_windowed).  One trailing dump-row
    # sentinel makes the lookahead read defined and in-bounds.
    block_tile = jnp.concatenate(
        [block_tile, jnp.full((1,), tiles_total, jnp.int32)])
    block_cnt = jnp.concatenate([block_cnt, jnp.zeros((1,), jnp.int32)])
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[pl.BlockSpec((PAR_ROWS, G_BLK), lambda b, bt, bc: (0, b),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((1, OUT_ROWS, tile_h * tile_w),
                               lambda b, bt, bc: (bt[b], 0, 0),
                               memory_space=pltpu.VMEM),
    )
    kernel = functools.partial(_fwd_kernel, tile_h=tile_h, tile_w=tile_w,
                               has_depth=has_depth, mxu=mxu, ablate=ablate)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(
            (tiles_total + 1, OUT_ROWS, tile_h * tile_w), jnp.float32),
        interpret=interpret,
    )(block_tile, block_cnt, params)


@functools.partial(jax.jit, static_argnames=("tiles_total", "tile_h",
                                             "tile_w", "interpret",
                                             "has_depth", "with_stats",
                                             "mxu", "ablate"))
def raster_backward_pallas(params, dtiles, block_tile, block_cnt,
                           tiles_total: int, tile_h: int, tile_w: int,
                           interpret: bool = False, has_depth: bool = True,
                           with_stats: bool = True, mxu: str = MXU_MODE,
                           ablate: str = ""):
    """Run the backward kernel. Returns per-entry grads [16, E].

    dtiles: [T + 1, 8, 128] with rows 0..3 = upstream d(color/depth),
            4 = upstream d(transmittance), 5 = D0' = dC.C_total + T_fin dT
            (row T is a zero pad the padding blocks read).
    """
    nb = block_tile.shape[0]
    # The per-tile cotangent rows stay in HBM; the kernel DMAs one row to
    # VMEM scratch on each tile change (see _bwd_kernel).  A regular
    # blocked input would need per-BLOCK pre-expansion (~780 MB/step); a
    # scalar-prefetch-dependent input index map costs 10-80 us per grid
    # step.  The explicit DMA moves |T| rows total.
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((PAR_ROWS, G_BLK), lambda b, bt, bc: (0, b),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pl.ANY),        # [T+1, 8, P] in HBM
        ],
        out_specs=pl.BlockSpec((GRAD_ROWS, G_BLK), lambda b, bt, bc: (0, b),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, tile_h * tile_w), jnp.float32),
            pltpu.VMEM((OUT_ROWS, tile_h * tile_w), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )
    kernel = functools.partial(_bwd_kernel, tile_h=tile_h, tile_w=tile_w,
                               has_depth=has_depth, with_stats=with_stats,
                               mxu=mxu, ablate=ablate)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((GRAD_ROWS, nb * G_BLK),
                                       jnp.float32),
        interpret=interpret,
    )(block_tile, block_cnt, params, dtiles)
