"""ParallelTrainer smoke: D=8 mesh, sharded stats + sharded densify,
training improves PSNR end to end."""
import numpy as np

from litegs_tpu import config as cfg
from litegs_tpu.data import synthetic_train
from litegs_tpu.parallel.trainer import ParallelTrainer


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
