"""Sharded densification == replicated densification, bit for bit.

VERDICT r1 item 4: shard the stats accumulators and the Gumbel-top-k
selection over the primitive axis, with a proof that sharded selection
equals replicated selection for the same key.
"""
import jax
import jax.numpy as jnp
import numpy as np

from jax.sharding import NamedSharding, PartitionSpec as P

from litegs_tpu import config as cfg
from litegs_tpu import parallel
from litegs_tpu.parallel import densify as pdensify
from litegs_tpu.scene.gaussians import GaussianParams
from litegs_tpu.training import densify, statistics
from litegs_tpu.training.optimizer import init_adam


def make_state(n_cap=1024, active=640, seed=0):
    rng = np.random.default_rng(seed)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    params = GaussianParams(xyz=mk(3, n_cap), scale=mk(3, n_cap) - 2,
                            rot=mk(4, n_cap), sh_0=mk(1, 3, n_cap),
                            sh_rest=mk(9, n_cap), opacity=mk(1, n_cap))
    adam = init_adam(params)
    stats = statistics.init_stats(n_cap)
    stats = stats._replace(
        weight_sum=jnp.asarray(
            (rng.random(n_cap) > 0.2) * rng.random(n_cap), jnp.float32),
        err_sum=mk(n_cap), err_sq_sum=jnp.abs(mk(n_cap)) + 0.01,
        frag_count=jnp.asarray(rng.integers(0, 50, n_cap), jnp.float32),
        visible_count=jnp.asarray(rng.integers(0, 8, n_cap), jnp.int32))
    return params, adam, stats


def shard_stats(mesh, stats):
    sharding = NamedSharding(mesh, P(parallel.DATA_AXIS))
    return jax.tree.map(lambda x: jax.device_put(x, sharding), stats)


def test_sharded_topk_equals_argsort():
    mesh = parallel.make_mesh(8)
    n = 1024
    rng = np.random.default_rng(1)
    keys = rng.standard_normal(n).astype(np.float32)
    keys[rng.random(n) < 0.3] = -np.inf
    # inject exact duplicates to exercise the tie-break
    keys[100:110] = keys[50]

    for budget in [0, 7, 128, 500, 900]:
        def f(local):
            return pdensify.sharded_topk_mask(local, jnp.int32(budget))

        mask = jax.jit(jax.shard_map(
            f, mesh=mesh, in_specs=P(parallel.DATA_AXIS),
            out_specs=P(parallel.DATA_AXIS), check_vma=False))(
                jnp.asarray(keys))
        mask = np.asarray(mask)

        order = np.argsort(-keys, kind="stable")
        want = np.zeros(n, bool)
        finite = keys > -np.inf
        take = order[:budget]
        want[take] = True
        want &= finite
        np.testing.assert_array_equal(mask, want, err_msg=f"budget={budget}")


def test_sharded_densify_equals_replicated():
    mesh = parallel.make_mesh(8)
    n_cap, active = 1024, 640
    params, adam, stats = make_state(n_cap, active)
    dp = cfg.DensifyParams(target_primitives=896, densify_from=0,
                           densify_until=10, densification_interval=1,
                           opacity_reset_interval=100)
    key = jax.random.PRNGKey(7)

    p_ref, a_ref, cnt_ref, did_ref = densify.densify_step(
        params, adam, stats, jnp.int32(active), 2, key, dp, 10, 256, 1.7,
        128)

    stats_sh = shard_stats(mesh, stats)
    p_sh, a_sh, cnt_sh, did_sh = pdensify.sharded_densify_step(
        mesh, params, adam, stats_sh, jnp.int32(active), 2, key, dp, 10,
        256, 1.7, 128)

    assert did_ref == did_sh
    assert int(cnt_ref) == int(cnt_sh)
    for lr, ls in zip(jax.tree.leaves((p_ref, a_ref)),
                      jax.tree.leaves((p_sh, a_sh))):
        np.testing.assert_array_equal(np.asarray(lr), np.asarray(ls))


def test_sharded_densify_official_equals_replicated():
    """Official (grad-threshold) mode through the sharded selector must be
    bit-identical to the replicated densify_step (VERDICT r3 missing #3:
    the sharded path used to hardwire the taming selector)."""
    mesh = parallel.make_mesh(8)
    n_cap, active = 1024, 640
    params, adam, stats = make_state(n_cap, active, seed=5)
    rng = np.random.default_rng(9)
    stats = stats._replace(
        grad_norm_sum=jnp.asarray(np.abs(rng.standard_normal(n_cap))
                                  * 0.01, jnp.float32),
        visible_count=jnp.asarray(rng.integers(1, 9, n_cap), jnp.int32))
    dp = cfg.DensifyParams(densify_mode="official", prune_mode="threshold",
                           densify_grad_threshold=0.0012, densify_from=0,
                           densify_until=10, densification_interval=1,
                           opacity_reset_interval=100)
    key = jax.random.PRNGKey(11)

    p_ref, a_ref, cnt_ref, did_ref = densify.densify_step(
        params, adam, stats, jnp.int32(active), 2, key, dp, 10, 256, 1.7,
        128)
    stats_sh = shard_stats(mesh, stats)
    p_sh, a_sh, cnt_sh, did_sh = pdensify.sharded_densify_step(
        mesh, params, adam, stats_sh, jnp.int32(active), 2, key, dp, 10,
        256, 1.7, 128)

    assert did_ref == did_sh
    assert int(cnt_ref) == int(cnt_sh)
    assert int(cnt_sh) != active, "test must exercise a nonzero append"
    for lr, ls in zip(jax.tree.leaves((p_ref, a_ref)),
                      jax.tree.leaves((p_sh, a_sh))):
        np.testing.assert_array_equal(np.asarray(lr), np.asarray(ls))


def test_scatter_stats_update_equals_psum():
    mesh = parallel.make_mesh(8)
    n = 512
    rng = np.random.default_rng(3)
    stats = statistics.init_stats(n)
    delta_per_dev = rng.standard_normal((8, n)).astype(np.float32)

    def f(stats_local, delta):
        d = statistics.StatsState(
            visible_count=delta[0].astype(jnp.int32),
            weight_sum=delta[0], weight_sq_sum=delta[0], err_sum=delta[0],
            err_sq_sum=delta[0], frag_count=delta[0],
            grad_norm_sum=delta[0])
        return pdensify.scatter_stats_update(stats_local, d)

    stats_spec = statistics.StatsState(*([P(parallel.DATA_AXIS)] * 7))
    out = jax.jit(jax.shard_map(
        f, mesh=mesh, in_specs=(stats_spec, P(parallel.DATA_AXIS)),
        out_specs=stats_spec, check_vma=False))(
            shard_stats(mesh, stats), jnp.asarray(delta_per_dev))
    want = delta_per_dev.sum(axis=0)
    np.testing.assert_allclose(np.asarray(out.weight_sum), want, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out.err_sum), want, rtol=1e-6)
