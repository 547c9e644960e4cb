"""Two-level (chunked) 1-D scans: fast cumsum / cummax at table scale.

XLA lowers ``cumsum``/``cummax`` over a length-N vector as log2(N) full
shifted-add passes (~22 passes at the 3M-entry binning scale; measured
0.03-0.1 Gelem/s, the slowest primitive class on this hardware after
gathers -- see PERF.md).  Splitting the vector into C chunks of K lanes
does log2(K) passes over the same N elements plus a tiny length-C scan:
~9/22 of the pass volume at K=512, and the minor-axis passes vectorize
across sublanes.

Only used for INTEGER scans (binning offsets/owners), where regrouping is
exact.  For floats the chunked order changes rounding -- don't swap it in
silently where f32 semantics are load-bearing.

Reference analogue: the prefix sums the reference gets from
``torch.cumsum`` / CUB device scans (binning.cu:33-110, wrapper.py:739-745);
this is the TPU-shaped equivalent.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

_CHUNK = 512
_MIN_N = 4 * _CHUNK


def _pad_reshape(x, fill):
    n = x.shape[0]
    c = -(-n // _CHUNK)
    pad = c * _CHUNK - n
    xp = jnp.pad(x, (0, pad), constant_values=fill)
    return xp.reshape(c, _CHUNK), n


def cumsum(x):
    """Inclusive cumsum over a 1-D integer array (two-level)."""
    if x.ndim != 1 or x.shape[0] < _MIN_N:
        return jnp.cumsum(x)
    xc, n = _pad_reshape(x, 0)
    inner = jnp.cumsum(xc, axis=1)
    carry = jnp.cumsum(inner[:, -1]) - inner[:, -1]
    return (inner + carry[:, None]).reshape(-1)[:n]


def cumsum2d(x):
    """Inclusive cumsum along axis 0 of a 2-D array (two-level).

    Used by the backward gradient reduction (ops/raster.py), where the
    columns are per-entry gradient channels in point-sorted order and the
    per-point sums are boundary differences of this cumsum.  For floats
    the chunked regrouping changes summation ORDER (not semantics) --
    fine for gradient accumulation, which the reference itself computes
    with unordered atomics (raster.cu:794-849).
    """
    n, k = x.shape
    if n < _MIN_N:
        return jnp.cumsum(x, axis=0)
    c = -(-n // _CHUNK)
    pad = c * _CHUNK - n
    xp = jnp.pad(x, ((0, pad), (0, 0)))
    xc = xp.reshape(c, _CHUNK, k)
    inner = jnp.cumsum(xc, axis=1)
    carry = jnp.cumsum(inner[:, -1, :], axis=0) - inner[:, -1, :]
    return (inner + carry[:, None, :]).reshape(-1, k)[:n]


def cummax(x):
    """Inclusive cummax over a 1-D integer array (two-level)."""
    if x.ndim != 1 or x.shape[0] < _MIN_N:
        return jax.lax.cummax(x)
    neutral = jnp.iinfo(x.dtype).min if jnp.issubdtype(x.dtype, jnp.integer) \
        else -jnp.inf
    xc, n = _pad_reshape(x, neutral)
    inner = jax.lax.cummax(xc, axis=1)
    tops = inner[:, -1]
    carry = jnp.where(
        jnp.arange(tops.shape[0]) == 0, neutral,
        jnp.roll(jax.lax.cummax(tops), 1))
    return jnp.maximum(inner, carry[:, None]).reshape(-1)[:n]
