"""ParallelTrainer: D=8 mesh, sharded stats + sharded densify, training
improves PSNR end to end; padded remainder groups (frames % D != 0);
adaptive capacity buckets; parallel-vs-sequential convergence parity at
equal optimizer updates (VERDICT r3 weak #3/#4)."""
import jax
import numpy as np

from litegs_tpu import config as cfg
from litegs_tpu.data import synthetic_train
from litegs_tpu.parallel.trainer import ParallelTrainer
from litegs_tpu.training import statistics
from litegs_tpu.training.trainer import Trainer


def test_parallel_trainer_improves_psnr():
    data, init_xyz, init_color = synthetic_train.make_task(
        n_points=400, n_frames=8, img_h=48, img_w=64, sh_degree=1, seed=3)
    trainer = ParallelTrainer(
        lp=cfg.ModelParams(sh_degree=1),
        op=cfg.OptimizationParams(iterations=64,
                                  position_lr_max_steps=64),
        pp=cfg.PipelineParams(raster_backend="jnp",
                              adaptive_capacity=False),
        dp=cfg.DensifyParams(densification_interval=2, densify_from=1,
                             densify_until=6,
                             opacity_reset_interval=10 ** 9,
                             target_primitives=768),
        caps=cfg.CapacityParams(primitive_capacity=1024,
                                visible_capacity=1024,
                                row_capacity=8192, entry_capacity=32768),
        data=data, spatial_lr_scale=4.4, n_devices=8)
    state, stats, hist = trainer.train(init_xyz, init_color, verbose=False)
    psnrs = [h["psnr"] for h in hist]
    assert psnrs[-1] > psnrs[0] + 1.0, psnrs
    assert trainer.overflow_count == 0
    assert hist[-1]["active"] % 128 == 0
    # densification actually grew the model
    assert hist[-1]["active"] >= hist[0]["active"]


def test_parallel_trainer_frames_not_multiple_of_d():
    """F=5 frames on D=4: the remainder group pads with zero-weight
    duplicates; training still improves and sees every frame."""
    data, init_xyz, init_color = synthetic_train.make_task(
        n_points=300, n_frames=5, img_h=48, img_w=64, sh_degree=1, seed=4)
    trainer = ParallelTrainer(
        lp=cfg.ModelParams(sh_degree=1),
        op=cfg.OptimizationParams(iterations=30,
                                  position_lr_max_steps=30),
        pp=cfg.PipelineParams(raster_backend="jnp",
                              adaptive_capacity=False),
        dp=cfg.DensifyParams(densify_from=1000),
        caps=cfg.CapacityParams(primitive_capacity=512,
                                visible_capacity=512,
                                row_capacity=8192, entry_capacity=32768),
        data=data, spatial_lr_scale=4.4, n_devices=4)
    assert trainer.steps_per_epoch == 2
    groups = trainer._epoch_groups(0)
    assert len(groups) == 2
    ids0, w0 = groups[0]
    ids1, w1 = groups[1]
    assert w0.sum() == 4 and w1.sum() == 1
    assert len(ids1) == 4  # padded to D with duplicates
    # every frame appears exactly once with weight 1
    live = np.concatenate([ids0[w0 > 0], ids1[w1 > 0]])
    assert sorted(live.tolist()) == list(range(5))
    state, stats, hist = trainer.train(init_xyz, init_color, verbose=False)
    assert hist[-1]["psnr"] > hist[0]["psnr"], hist


def test_parallel_equals_sequential_at_equal_updates():
    """Convergence parity (promotes scripts/convergence_parallel.py into
    the suite): at equal optimizer updates the D-view mean-gradient run
    must match or exceed the sequential run's PSNR within 1.5 dB."""
    data, init_xyz, init_color = synthetic_train.make_task(
        n_points=300, n_frames=4, img_h=48, img_w=64, sh_degree=1, seed=5)
    lp = cfg.ModelParams(sh_degree=1)
    pp = cfg.PipelineParams(raster_backend="jnp", adaptive_capacity=False)
    dp = cfg.DensifyParams(densify_from=1000)
    caps = cfg.CapacityParams(primitive_capacity=512, visible_capacity=512,
                              row_capacity=8192, entry_capacity=32768)
    n_updates = 12

    # sequential: 3 epochs x 4 frames = 12 updates
    seq = Trainer(lp=lp, op=cfg.OptimizationParams(
        iterations=n_updates, position_lr_max_steps=n_updates),
        pp=pp, dp=dp, caps=caps, data=data, spatial_lr_scale=4.4)
    state = seq.init_state(init_xyz, init_color)
    stats = statistics.init_stats(caps.primitive_capacity)
    for ep in range(3):
        state, stats, m_seq = seq.run_epoch(state, stats, ep)
        state, stats = seq.epoch_boundary(state, stats, ep)

    # parallel D=4: 12 epochs x 1 step = 12 updates of the 4-view mean
    par = ParallelTrainer(lp=lp, op=cfg.OptimizationParams(
        iterations=48, position_lr_max_steps=12),
        pp=pp, dp=dp, caps=caps, data=data, spatial_lr_scale=4.4,
        n_devices=4)
    pstate = par.init_state(init_xyz, init_color)
    pstats = par.init_stats()
    for ep in range(12):
        pstate, pstats, m_par = par.run_epoch(pstate, pstats, ep)
        pstate, pstats = par.epoch_boundary(pstate, pstats, ep)

    assert m_par["psnr"] > m_seq["psnr"] - 1.5, (m_par, m_seq)
    assert par.overflow_count == 0
