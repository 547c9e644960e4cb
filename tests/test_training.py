"""End-to-end training on a synthetic closed-loop task: PSNR must improve,
densification must grow/prune at chunk granularity, sparse Adam must leave
invisible chunks untouched."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from litegs_tpu import config as cfg
from litegs_tpu.data import synthetic_train
from litegs_tpu.scene.gaussians import GaussianParams
from litegs_tpu.training import densify, statistics
from litegs_tpu.training.optimizer import (AdamState, LearningRates,
                                           init_adam, sparse_adam_step)
from litegs_tpu.training.trainer import Trainer


def small_setup(iterations=64, target=1024, densify_from=1, interval=2,
                n_points=500, n_frames=8):
    data, init_xyz, init_color = synthetic_train.make_task(
        n_points=n_points, n_frames=n_frames, img_h=48, img_w=64,
        sh_degree=1, seed=3)
    lp = cfg.ModelParams(sh_degree=1)
    op = cfg.OptimizationParams(iterations=iterations,
                                position_lr_max_steps=iterations)
    pp = cfg.PipelineParams(raster_backend="jnp")
    dp = cfg.DensifyParams(densification_interval=interval,
                           densify_from=densify_from, densify_until=6,
                           opacity_reset_interval=100,
                           target_primitives=target)
    caps = cfg.CapacityParams(primitive_capacity=2048,
                              visible_capacity=2048,
                              row_capacity=8192, entry_capacity=32768)
    trainer = Trainer(lp=lp, op=op, pp=pp, dp=dp, caps=caps, data=data,
                      spatial_lr_scale=4.4)
    return trainer, init_xyz, init_color


def test_training_improves_psnr():
    trainer, init_xyz, init_color = small_setup(iterations=96)
    state = trainer.init_state(init_xyz, init_color)
    stats = statistics.init_stats(trainer.caps.primitive_capacity)
    state0 = state
    state, stats, m0 = trainer.run_epoch(state0, stats, epoch=0,
                                         frame_ids=[0])
    first_psnr = m0["psnr"]
    state, stats, hist = trainer.train(init_xyz, init_color, verbose=False)
    final_psnr = hist[-1]["psnr"]
    assert final_psnr > first_psnr + 2.0, (first_psnr, final_psnr)
    assert final_psnr > 22.0, final_psnr
    # Early-training size growth can overflow a few frames at the tight
    # default capacity margin; every overflow is a safe retried no-op
    # (test_overflow_skips_update_and_retries pins that), so bound the
    # COUNT rather than demanding zero -- what must never happen is a
    # corrupted update, which the PSNR bars above would expose.
    # bound tuned for capacity_margin=1.05 (observed 5; was <=4 at 1.1)
    assert trainer.overflow_count <= 8, trainer.overflow_count


def test_densify_grows_at_chunk_granularity():
    trainer, init_xyz, init_color = small_setup(
        iterations=80, target=1536, densify_from=1, interval=1)
    state, stats, hist = trainer.train(init_xyz, init_color, verbose=False)
    actives = [h["active"] for h in hist]
    assert all(a % 128 == 0 for a in actives), actives
    assert actives[-1] > actives[0], actives
    assert actives[-1] <= trainer.caps.primitive_capacity


def test_sparse_adam_leaves_invisible_chunks():
    n = 512
    chunk = 128
    rng = np.random.default_rng(0)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    params = GaussianParams(xyz=mk(3, n), scale=mk(3, n), rot=mk(4, n),
                            sh_0=mk(1, 3, n), sh_rest=mk(9, n),
                            opacity=mk(1, n))
    grads = jax.tree.map(lambda x: jnp.ones_like(x), params)
    adam = init_adam(params)
    lrs = LearningRates(xyz=jnp.float32(0.1), scale=0.1, rot=0.1, sh_0=0.1,
                        sh_rest=0.1, opacity=0.1)
    mask = jnp.asarray([True, False, True, False])
    new_params, new_adam = sparse_adam_step(params, grads, adam, lrs, mask,
                                            chunk)
    for leaf_old, leaf_new in zip(jax.tree.leaves(params),
                                  jax.tree.leaves(new_params)):
        vis = np.asarray(leaf_new)[..., :128]
        invis = np.asarray(leaf_new)[..., 128:256]
        np.testing.assert_array_equal(invis, np.asarray(leaf_old)[..., 128:256])
        assert not np.allclose(vis, np.asarray(leaf_old)[..., :128])
    # no bias correction: first visible step = -lr * m1 / (sqrt(v1) + eps)
    m1 = 0.1 * 1.0
    v1 = 0.001 * 1.0
    expected = -0.1 * m1 / (np.sqrt(v1) + 1e-15)
    np.testing.assert_allclose(
        np.asarray(new_params.xyz[:, 0] - params.xyz[:, 0]), expected,
        rtol=1e-5)


def test_prune_compacts_and_appends():
    n_cap = 512
    chunk = 128
    rng = np.random.default_rng(1)
    mk = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    params = GaussianParams(xyz=mk(3, n_cap), scale=mk(3, n_cap) - 2,
                            rot=mk(4, n_cap), sh_0=mk(1, 3, n_cap),
                            sh_rest=mk(9, n_cap), opacity=mk(1, n_cap))
    adam = init_adam(params)
    stats = statistics.init_stats(n_cap)
    # mark the first 128 primitives as never-blended -> pruned
    w = jnp.ones(n_cap).at[:128].set(0.0)
    stats = stats._replace(weight_sum=w,
                           err_sq_sum=jnp.ones(n_cap),
                           frag_count=jnp.ones(n_cap) * 5)
    dp = cfg.DensifyParams(target_primitives=384, densify_from=0,
                           densify_until=10, densification_interval=1,
                           opacity_reset_interval=100)
    key = jax.random.PRNGKey(0)
    p2, a2, count, did = densify.densify_step(
        params, adam, stats, jnp.int32(384), 1, key, dp, 10, 256, 1.0,
        chunk)
    assert did
    assert int(count) % 128 == 0
    # pruned block compacted away: survivors [128:384) moved to the front
    np.testing.assert_allclose(np.asarray(p2.xyz)[:, :128],
                               np.asarray(params.xyz)[:, 128:256])


def test_tile_blend_stats_collected():
    trainer, init_xyz, init_color = small_setup(iterations=24,
                                                densify_from=1, interval=1)
    state, stats, hist = trainer.train(init_xyz, init_color, verbose=False)
    order = trainer.complexity_sorted_tiles()
    assert order is not None
    tb = trainer.tile_blend_max
    assert tb.ndim == 1 and tb.sum() > 0
    assert tb[order[0]] == tb.max()


def test_overflow_skips_update_and_retries():
    """Overflow-safe stepping (reference never-truncate discipline,
    binning.cu:137-169): a step whose binning table overflows must leave
    params/Adam/step bit-identical, and the trainer must retry the frame
    after re-bucketing so training still progresses."""
    trainer, init_xyz, init_color = small_setup(iterations=16)
    # force an overflowing first epoch: entry capacity far below demand
    tiny = cfg.CapacityParams(primitive_capacity=2048,
                              visible_capacity=2048,
                              row_capacity=256, entry_capacity=256)
    state = trainer.init_state(init_xyz, init_color)
    stats = statistics.init_stats(trainer.caps.primitive_capacity)

    from litegs_tpu.training.trainer import make_train_step, \
        masked_chunk_aabb
    step_fn = make_train_step(
        trainer.lp, trainer.op, trainer.pp, tiny, trainer.img_h,
        trainer.img_w, trainer.spatial_lr_scale, sh_degree=0,
        collect_stats=False)
    origin, extend = masked_chunk_aabb(state.params, state.active_count,
                                       trainer.pp.cluster_size)
    d = trainer.data
    # host snapshot first: the jitted step donates state buffers
    before = [np.asarray(x).copy() for x in jax.tree.leaves(state)]
    new_state, new_stats, _, metrics = step_fn(
        state, stats, origin, extend, d.view[0], d.proj[0], d.planes[0],
        d.center[0], d.images[0], None, jnp.int32(0))
    assert bool(metrics["overflow"])
    # params, moments and step count bit-identical
    for a, b in zip(before, jax.tree.leaves(new_state)):
        np.testing.assert_array_equal(a, np.asarray(b))

    # the trainer-level retry path: first epoch overflows (tiny initial
    # caps), feedback re-buckets, retried frames actually train
    trainer2, init_xyz, init_color = small_setup(iterations=16)
    trainer2.caps = cfg.CapacityParams(
        primitive_capacity=2048, visible_capacity=2048,
        row_capacity=4096, entry_capacity=4096)
    state = trainer2.init_state(init_xyz, init_color)
    stats = statistics.init_stats(trainer2.caps.primitive_capacity)
    state, stats, m = trainer2.run_epoch(state, stats, epoch=0)
    assert int(state.step) == trainer2.n_frames, (
        int(state.step), trainer2.overflow_count)


def test_densify_append_stays_chunk_aligned_when_scores_scarce():
    """If fewer primitives carry a positive score than the chunk-trimmed
    budget, the appended count must still floor to a chunk multiple --
    a partial chunk would be masked out of the AABB pass and silently
    never render."""
    from litegs_tpu.scene.gaussians import create_gaussians, pad_params
    from litegs_tpu.training import densify
    from litegs_tpu.training.optimizer import init_adam
    import jax

    rng = np.random.default_rng(0)
    n_active, cap, chunk = 256, 1024, 128
    params = pad_params(create_gaussians(
        rng.standard_normal((256, 3)).astype(np.float32),
        rng.random((256, 3)).astype(np.float32), 1), cap)
    adam = init_adam(params)
    stats = statistics.init_stats(cap)
    # only 3 primitives have nonzero err stats -> 3 positive scores,
    # far below the budget the ramp asks for
    err2 = np.zeros(cap, np.float32)
    cnt = np.zeros(cap, np.float32)
    err2[:3] = 5.0
    cnt[:3] = 7.0
    stats = stats._replace(
        err_sq_sum=jnp.asarray(err2), frag_count=jnp.asarray(cnt))
    dp = cfg.DensifyParams(target_primitives=1000, densify_from=0,
                           densify_until=4, densification_interval=1)
    p2, a2, active = densify.split_and_clone(
        params, adam, stats, jnp.int32(n_active), epoch=1,
        key=jax.random.PRNGKey(0), dp=dp, densify_until=4,
        init_points_num=n_active, screen_extent=1.0, chunk_size=chunk)
    active = int(active)
    assert active % chunk == 0, active
    assert active >= n_active


def test_update_stats_matches_scatter_add():
    """The chunk-granular gather form of update_stats (r3: inverse map +
    chunk row-gather, ~16x cheaper on-chip than 7 scatter-adds at 1M
    indices) must equal the per-primitive scatter-add, including prior
    accumulation, the invalid tail, and untouched chunks."""
    from litegs_tpu.ops.raster import RasterStats

    rng = np.random.default_rng(3)
    chunk = 128
    n = 8 * chunk
    cap_chunks = 4
    mv = cap_chunks * chunk
    num_vis = 3
    ids = np.array([5, 0, 2, 7], np.int32)  # slot 3 (id 7) is tail junk
    valid = (np.arange(mv) // chunk) < num_vis
    pv = rng.random(mv) > 0.5
    vals = {f: rng.standard_normal(mv).astype(np.float32)
            for f in ["weight_sum", "err_sum", "err_square_sum",
                      "frag_count", "grad_norm"]}
    rs = RasterStats(**{k: jnp.asarray(v) for k, v in vals.items()})
    stats0 = statistics.init_stats(n)
    stats0 = statistics.StatsState(
        *[x + (np.arange(n) % 7).astype(x.dtype) for x in stats0])

    got = statistics.update_stats(stats0, jnp.asarray(ids),
                                  jnp.asarray(valid), jnp.asarray(pv),
                                  rs, chunk)

    idx = ids.repeat(chunk) * chunk + np.tile(np.arange(chunk), cap_chunks)
    idx = np.where(valid, idx, n)

    def ref_add(acc, val):
        o = np.append(np.asarray(acc, np.float64), 0.0)
        np.add.at(o, idx, np.asarray(val, np.float64))
        return o[:n]

    want = {
        "visible_count": ref_add(stats0.visible_count,
                                 (pv & valid).astype(np.int32)),
        "weight_sum": ref_add(stats0.weight_sum, vals["weight_sum"]),
        "weight_sq_sum": ref_add(stats0.weight_sq_sum,
                                 vals["weight_sum"] ** 2),
        "err_sum": ref_add(stats0.err_sum, vals["err_sum"]),
        "err_sq_sum": ref_add(stats0.err_sq_sum, vals["err_square_sum"]),
        "frag_count": ref_add(stats0.frag_count, vals["frag_count"]),
        "grad_norm_sum": ref_add(stats0.grad_norm_sum, vals["grad_norm"]),
    }
    for f in statistics.StatsState._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(got, f), np.float64), want[f],
            atol=1e-5, err_msg=f)
