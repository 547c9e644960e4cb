"""Streaming expansion / monotonic-gather Pallas kernels vs the jnp
rank-decode oracle (interpret mode on CPU)."""
import jax.numpy as jnp
import numpy as np

from litegs_tpu.ops import stream_gather as sg
from litegs_tpu.ops.binning import expand_by_counts


def test_expand_attrs_matches_oracle():
    rng = np.random.default_rng(0)
    s, a, e = 300, 16, 1024
    counts = rng.integers(1, 5, s).astype(np.int32)
    counts[200:] = 0  # live items form a prefix
    attrs = rng.random((a, s)).astype(np.float32)
    out, rank, total = sg.expand_attrs(jnp.asarray(attrs),
                                       jnp.asarray(counts), e,
                                       interpret=True)
    owner_ref, rank_ref, _, total_ref = expand_by_counts(
        jnp.asarray(counts), e)
    assert int(total) == int(total_ref)
    t = int(total)
    np.testing.assert_array_equal(np.asarray(rank)[:t],
                                  np.asarray(rank_ref)[:t])
    np.testing.assert_allclose(np.asarray(out)[:, :t],
                               attrs[:, np.asarray(owner_ref)[:t]],
                               rtol=1e-6)


def test_expand_attrs_spans_block_boundaries():
    # single item covering many blocks + many 1-slot items
    counts = np.r_[np.full(1, 200), np.ones(150)].astype(np.int32)
    attrs = np.arange(151, dtype=np.float32)[None].repeat(8, 0)
    out, rank, total = sg.expand_attrs(jnp.asarray(attrs),
                                       jnp.asarray(counts), 512,
                                       interpret=True)
    t = int(total)
    assert t == 350
    want = np.repeat(np.arange(151), counts)
    np.testing.assert_allclose(np.asarray(out)[0, :t], want, rtol=1e-6)


def test_gather_blocks():
    rng = np.random.default_rng(1)
    s = 700
    attrs = rng.random((8, s)).astype(np.float32)
    src_lo = jnp.asarray(np.sort(rng.integers(0, s - 1, 4)).astype(
        np.int32))
    g = np.asarray(sg.gather_blocks(jnp.asarray(attrs), src_lo,
                                    interpret=True))
    attrs_p = np.pad(attrs, ((0, 0), (0, 1024)))
    for b in range(4):
        lo = int(src_lo[b])
        np.testing.assert_allclose(g[:, b * 128:(b + 1) * 128],
                                   attrs_p[:, lo:lo + 128], rtol=1e-6)
