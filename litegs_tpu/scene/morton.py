"""Morton (Z-order) spatial sorting of primitives.

The reference resorts every densification interval so that fixed-size chunks
stay spatially coherent (litegs/scene/point.py:27-154).  We do the same, but
with 10 bits per axis packed in an int32 key (the reference uses 21-bit
int64 codes; TPU sorts 32-bit keys far faster and 2^30 cells >> any
practical primitive count, so chunk-level coherence is unchanged -- ties
keep their previous order via stable sort).
"""
from __future__ import annotations

import jax.numpy as jnp
import jax


def _part_bits_10(v):
    """Spread the low 10 bits of v so they occupy every 3rd bit."""
    v = v & 0x3FF
    v = (v | (v << 16)) & 0x30000FF
    v = (v | (v << 8)) & 0x300F00F
    v = (v | (v << 4)) & 0x30C30C3
    v = (v | (v << 2)) & 0x9249249
    return v


def morton_codes(xyz, bits: int = 10):
    """3D Morton codes from positions.

    Args:
      xyz: [3, N] positions.
    Returns:
      [N] int32 codes (normalized to the point-cloud AABB, as the reference
      does at point.py:49-57).
    """
    del bits  # fixed to 10 per axis for int32 keys
    mins = jnp.min(xyz, axis=1, keepdims=True)
    maxs = jnp.max(xyz, axis=1, keepdims=True)
    scale = (1 << 10) - 1
    denom = jnp.maximum(maxs - mins, 1e-12)
    q = jnp.clip(((xyz - mins) / denom * scale), 0, scale).astype(jnp.int32)
    return (_part_bits_10(q[0]) | (_part_bits_10(q[1]) << 1)
            | (_part_bits_10(q[2]) << 2))


def spatial_sort_indices(xyz, active_mask=None):
    """Stable Morton-order permutation; inactive points sort to the end.

    Matches reference spatial_refine's ordering (point.py:91-92) extended
    with the static-capacity active mask.
    """
    codes = morton_codes(xyz)
    if active_mask is not None:
        codes = jnp.where(active_mask, codes, jnp.int32(0x7FFFFFFF))
    n = codes.shape[0]
    _, idx = jax.lax.sort_key_val(codes, jnp.arange(n, dtype=jnp.int32),
                                  is_stable=True)
    return idx
