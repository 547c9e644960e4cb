"""Official (original-3DGS) densification mode: grad-threshold clone/split
driven by the accumulated NDC positional-gradient norms.

The reference ships a DensityControllerOfficial but its densify signal
('mean2d_grad', densify.py:123) is never produced by any code path, so it
cannot run there; here the signal is wired through raster_stats.grad_norm.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__))))

from test_training import small_setup

import dataclasses


def test_official_mode_grows_and_trains():
    trainer, init_xyz, init_color = small_setup(
        iterations=80, target=1536, densify_from=1, interval=2)
    trainer.dp = dataclasses.replace(
        trainer.dp, densify_mode="official",
        densify_grad_threshold=1e-5,   # low bar -> growth on a tiny scene
        prune_mode="threshold")
    state, stats, hist = trainer.train(init_xyz, init_color, verbose=False)
    actives = [h["active"] for h in hist]
    assert all(a % 128 == 0 for a in actives), actives
    assert actives[-1] > actives[0], actives
    assert hist[-1]["psnr"] > hist[0]["psnr"] + 2.0, (
        hist[0]["psnr"], hist[-1]["psnr"])


def test_official_selection_matches_accumulation_semantics():
    """Unit-level check of the original-3DGS selection rule: a primitive
    is selected iff its MEAN per-iteration NDC positional-gradient norm
    (accumulated norms / iterations visible, the Inria accumulation
    scheme) reaches densify_grad_threshold, in accumulation order up to
    the chunk-trimmed budget (training/densify.py official mode)."""
    import jax
    import jax.numpy as jnp
    from litegs_tpu import config as cfg
    from litegs_tpu.scene.gaussians import GaussianParams
    from litegs_tpu.training import densify, statistics
    from litegs_tpu.training.optimizer import init_adam

    n_cap, active = 1024, 512
    rng = np.random.default_rng(5)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    params = GaussianParams(xyz=mk(3, n_cap), scale=mk(3, n_cap) - 2,
                            rot=mk(4, n_cap), sh_0=mk(1, 3, n_cap),
                            sh_rest=mk(9, n_cap), opacity=mk(1, n_cap))
    adam = init_adam(params)

    # hand-built accumulators: primitive i was visible vis[i] times and
    # accumulated grad_sum[i] of NDC-grad norms
    vis = rng.integers(1, 9, n_cap).astype(np.int32)
    grad_sum = rng.random(n_cap).astype(np.float32) * 0.01
    thr = 2e-3
    mean_grad = grad_sum / np.maximum(vis, 1)
    stats = statistics.init_stats(n_cap)
    stats = stats._replace(
        grad_norm_sum=jnp.asarray(grad_sum),
        visible_count=jnp.asarray(vis),
        weight_sum=jnp.ones(n_cap))  # nothing pruned

    dp = cfg.DensifyParams(densify_mode="official",
                           densify_grad_threshold=thr,
                           prune_mode="weight", densify_from=0,
                           densify_until=10, densification_interval=1,
                           opacity_reset_interval=10 ** 9)
    key = jax.random.PRNGKey(0)
    p2, a2, count, did = densify.densify_step(
        params, adam, stats, jnp.int32(active), 1, key, dp, 10, 256, 1.0,
        128)
    assert did
    appended = int(count) - active

    # expected: all active primitives above threshold, chunk-trimmed in
    # index (accumulation) order
    want = np.flatnonzero((mean_grad >= thr)[:active])
    budget = (len(want) // 128) * 128
    assert appended == min(budget, n_cap - active), (
        appended, len(want), budget)
    if appended:
        # the appended tail rows must be split/clones of exactly the
        # first `appended` above-threshold primitives (in index order);
        # clones copy sh_0 verbatim and splits keep sh_0 too
        src = want[:appended]
        np.testing.assert_allclose(
            np.asarray(p2.sh_0)[..., active:active + appended],
            np.asarray(params.sh_0)[..., src], atol=1e-6)


def test_official_mode_collects_every_epoch():
    """Original-3DGS accumulation: official mode collects statistics on
    EVERY epoch before densify_until (not just densify epochs), so
    grad_norm_sum / visible_count average over all iterations between
    densify events; taming keeps the one-epoch window."""
    trainer, _, _ = small_setup(
        iterations=80, target=1536, densify_from=2, interval=4)
    trainer.dp = dataclasses.replace(trainer.dp, densify_mode="official")
    until = trainer.densify_until
    assert until > 3
    assert trainer._collect_stats(0)          # pre-from epochs accumulate
    assert trainer._collect_stats(1)
    assert trainer._collect_stats(3)          # non-densify epoch
    assert not trainer._collect_stats(until)  # after the densify window
    assert trainer.is_densify_active(4)       # from=2, interval=4

    trainer.dp = dataclasses.replace(trainer.dp, densify_mode="taming")
    assert not trainer._collect_stats(1)
    assert not trainer._collect_stats(3)
    assert trainer._collect_stats(4) and trainer.is_densify_active(4)


def test_official_mode_accumulates_across_epochs():
    """Stats must grow across consecutive collected epochs and reset
    after a densify event."""
    import jax.numpy as jnp
    from litegs_tpu.training import statistics

    trainer, init_xyz, init_color = small_setup(
        iterations=64, target=1536, densify_from=3, interval=3)
    trainer.dp = dataclasses.replace(trainer.dp, densify_mode="official")
    state = trainer.init_state(init_xyz, init_color)
    stats = statistics.init_stats(trainer.caps.primitive_capacity)

    state, stats, _ = trainer.run_epoch(state, stats, 0)
    v1 = int(jnp.sum(stats.visible_count))
    g1 = float(jnp.sum(stats.grad_norm_sum))
    assert v1 > 0 and g1 > 0          # collected on a non-densify epoch
    state, stats, _ = trainer.run_epoch(state, stats, 1)
    v2 = int(jnp.sum(stats.visible_count))
    assert v2 > v1                    # accumulated, not overwritten
    # densify epoch resets the accumulators afterwards
    state, stats, _ = trainer.run_epoch(state, stats, 3)
    state, stats = trainer.epoch_boundary(state, stats, 3)
    assert int(jnp.sum(stats.visible_count)) == 0
