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


def test_expand_attrs_windowed_random():
    """Windowed expansion vs expand_by_counts, zero counts interspersed."""
    import jax.numpy as jnp
    import numpy as np
    from litegs_tpu.ops import binning
    from litegs_tpu.ops.stream_gather import expand_attrs_windowed

    rng = np.random.default_rng(3)
    s = 700
    counts = rng.integers(0, 4, s).astype(np.int32)
    counts[rng.random(s) < 0.4] = 0
    attrs = rng.standard_normal((8, s)).astype(np.float32)
    total = int(counts.sum())
    cap = ((total + 255) // 256) * 256 + 256
    out, rank, tot, ok = expand_attrs_windowed(
        jnp.asarray(attrs), jnp.asarray(counts), cap,
        window_items=256, slots_per_step=128, interpret=True)
    assert bool(ok)
    assert int(tot) == total
    owner, rank_ref, valid, _ = binning.expand_by_counts(
        jnp.asarray(counts), cap)
    np.testing.assert_array_equal(np.asarray(rank)[:total],
                                  np.asarray(rank_ref)[:total])
    want = attrs[:, np.asarray(owner)[:total]]
    np.testing.assert_array_equal(np.asarray(out)[:, :total], want)


def test_expand_attrs_windowed_overflow_flag():
    """A long zero-count run exceeding the window must flip ok to False."""
    import jax.numpy as jnp
    import numpy as np
    from litegs_tpu.ops.stream_gather import expand_attrs_windowed

    s = 1024
    counts = np.zeros(s, np.int32)
    counts[0] = 1
    counts[600] = 300   # slots 1..300 owned by item 600: window 256 misses
    attrs = np.arange(8 * s, dtype=np.float32).reshape(8, s)
    out, rank, tot, ok = expand_attrs_windowed(
        jnp.asarray(attrs), jnp.asarray(counts), 512,
        window_items=256, slots_per_step=128, interpret=True)
    assert not bool(ok)


def test_expand_attrs_windowed_multi_slot_steps():
    import jax.numpy as jnp
    import numpy as np
    from litegs_tpu.ops import binning
    from litegs_tpu.ops.stream_gather import expand_attrs_windowed

    rng = np.random.default_rng(5)
    s = 2000
    counts = rng.integers(1, 5, s).astype(np.int32)  # contiguous prefix
    attrs = rng.standard_normal((16, s)).astype(np.float32)
    total = int(counts.sum())
    cap = ((total + 511) // 512) * 512 + 512
    out, rank, tot, ok = expand_attrs_windowed(
        jnp.asarray(attrs), jnp.asarray(counts), cap,
        window_items=640, slots_per_step=512, interpret=True)
    assert bool(ok) and int(tot) == total
    owner, rank_ref, valid, _ = binning.expand_by_counts(
        jnp.asarray(counts), cap)
    np.testing.assert_array_equal(np.asarray(rank)[:total],
                                  np.asarray(rank_ref)[:total])
    want = np.asarray(attrs)[:, np.asarray(owner)[:total]]
    np.testing.assert_array_equal(np.asarray(out)[:, :total], want)
