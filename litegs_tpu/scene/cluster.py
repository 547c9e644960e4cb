"""Chunked (clustered) primitive organization.

Primitives are grouped into fixed-size chunks of 128 for coarse frustum
culling (reference: litegs/scene/cluster.py).  Unlike the reference, which
reshapes tensors to [..., chunks, chunk_size], we keep flat [C, N] arrays
(N a multiple of chunk_size) and treat chunking as *indexing arithmetic* --
reshapes are free under XLA and a flat layout keeps every downstream op on
the natural lane-major layout.
"""
from __future__ import annotations

import math

import jax.numpy as jnp

from ..ops import projection

# sqrt(2 ln 255): ellipse radius (in stddevs) where alpha falls to 1/255 for
# a fully opaque gaussian (reference cluster.py:37).
_EXTEND_COEFF = math.sqrt(2.0 * math.log(255.0))


def chunk_aabb(xyz, scale_act, rot_unit, chunk_size: int = 128):
    """Per-chunk axis-aligned bounding boxes.

    Per-point extent = sqrt(2 ln 255) * row-abs-sum of M = R*S (reference
    cluster.py:30-46), then min/max over each chunk.

    Args:
      xyz:       [3, N] positions (N multiple of chunk_size).
      scale_act: [3, N] activated (exp'd) scales.
      rot_unit:  [4, N] unit quaternions.
    Returns:
      (origin [3, C], extend [3, C]) with C = N // chunk_size.
    """
    n = xyz.shape[-1]
    assert n % chunk_size == 0
    m = projection.create_transform_matrix(scale_act, rot_unit)  # [3,3,N]
    point_ext = jnp.sum(jnp.abs(m), axis=0) * _EXTEND_COEFF      # [3,N]
    hi = (xyz + point_ext).reshape(3, -1, chunk_size).max(axis=-1)
    lo = (xyz - point_ext).reshape(3, -1, chunk_size).min(axis=-1)
    return (hi + lo) * 0.5, (hi - lo) * 0.5


def visible_chunk_ids(visibility, visible_chunk_capacity: int):
    """Compact visible chunk indices to a static-capacity prefix.

    The reference stream-compacts on-device with a ballot/atomic cascade
    (compact.cu:419-501) into a dynamically-predicted allocation; the TPU
    analogue is a stable sort moving visible chunks to the front of a fixed
    buffer.

    Args:
      visibility: [C] bool per chunk.
      visible_chunk_capacity: static output length.
    Returns:
      (chunk_ids [cap] int32, num_visible scalar int32, overflowed bool).
      Slots past num_visible hold arbitrary chunk ids; consumers mask.
    """
    import jax
    c = visibility.shape[0]
    key = jnp.where(visibility, 0, 1).astype(jnp.int32)
    _, ids = jax.lax.sort_key_val(key, jnp.arange(c, dtype=jnp.int32),
                                  is_stable=True)
    num = jnp.sum(visibility, dtype=jnp.int32)
    cap = visible_chunk_capacity
    return ids[:cap], jnp.minimum(num, cap), num > cap


def gather_chunks(arr, chunk_ids, chunk_size: int = 128):
    """Gather chunks from a flat [.., N] array -> [.., cap*chunk_size].

    Functional analogue of the reference's cull+compact gather
    (compact.cu:825-893 activate_forward_kernel's chunk gather).
    """
    lead = arr.shape[:-1]
    chunked = arr.reshape(*lead, -1, chunk_size)
    out = jnp.take(chunked, chunk_ids, axis=len(lead))
    return out.reshape(*lead, -1)


def scatter_chunk_mask(chunk_ids, num_visible, num_chunks: int):
    """Boolean [num_chunks] mask marking the first ``num_visible`` ids."""
    valid = jnp.arange(chunk_ids.shape[0]) < num_visible
    mask = jnp.zeros((num_chunks,), bool)
    return mask.at[chunk_ids].max(valid)
