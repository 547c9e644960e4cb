"""Two-level scans must be bit-exact against the plain primitives."""
import jax
import jax.numpy as jnp
import numpy as np

from litegs_tpu.ops import scan


def test_cumsum_matches_plain():
    rng = np.random.default_rng(0)
    for n in (7, 511, 512, 2048, 4096 + 1, 100_000 + 37):
        x = jnp.asarray(rng.integers(0, 5, n), jnp.int32)
        got = np.asarray(jax.jit(scan.cumsum)(x))
        want = np.cumsum(np.asarray(x))
        assert (got == want).all(), n


def test_cummax_matches_plain():
    rng = np.random.default_rng(1)
    for n in (7, 512, 4096 + 3, 100_000 + 37):
        # include negatives: the carry neutral must be the dtype min
        x = jnp.asarray(rng.integers(-1000, 1000, n), jnp.int32)
        got = np.asarray(jax.jit(scan.cummax)(x))
        want = np.maximum.accumulate(np.asarray(x))
        assert (got == want).all(), n


def test_cummax_first_chunk_neutral():
    # a strictly negative array exercises the first-chunk carry neutral
    x = jnp.full((4096,), -7, jnp.int32)
    got = np.asarray(jax.jit(scan.cummax)(x))
    assert (got == -7).all()


def test_cumsum2d_matches_plain():
    rng = np.random.default_rng(2)
    for n, k in ((7, 3), (511, 10), (2048, 10), (100_000 + 37, 6)):
        xi = jnp.asarray(rng.integers(-4, 5, (n, k)), jnp.int32)
        got = np.asarray(jax.jit(scan.cumsum2d)(xi))
        want = np.cumsum(np.asarray(xi), axis=0)
        assert (got == want).all(), (n, k)
        # float path: regrouped order, tolerance comparison
        xf = jnp.asarray(rng.standard_normal((n, k)), jnp.float32)
        gotf = np.asarray(jax.jit(scan.cumsum2d)(xf))
        wantf = np.cumsum(np.asarray(xf, np.float64), axis=0)
        np.testing.assert_allclose(gotf, wantf, atol=5e-3 * max(n**0.5, 1))
