#!/usr/bin/env python
"""On-device end-to-end convergence check (no datasets required).

Trains against ground-truth renders of a procedurally-generated gaussian
scene (the closed-loop task from litegs_tpu.data.synthetic_train) with the
full pipeline -- Pallas kernels, densification, capacity buckets -- and
reports train PSNR over epochs.  Complements the CPU test suite by
exercising the compiled kernels at a realistic scale on real hardware.

    python scripts/synthetic_convergence.py --points 20000 --iters 1200
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--points", type=int, default=20000)
    parser.add_argument("--frames", type=int, default=8)
    parser.add_argument("--height", type=int, default=256)
    parser.add_argument("--width", type=int, default=384)
    parser.add_argument("--iters", type=int, default=1200)
    parser.add_argument("--target", type=int, default=60000)
    parser.add_argument("--sh_degree", type=int, default=2)
    parser.add_argument("--backend", type=str, default=None)
    parser.add_argument("--densify_mode", type=str, default="taming",
                        choices=["taming", "official"])
    parser.add_argument("--init_points", type=int, default=None,
                        help="subsample the GT cloud to this many init "
                             "points (SfM-sparse-init regime; the model "
                             "must densify toward the GT density)")
    parser.add_argument("--color_freq", type=float, default=1.0,
                        help="GT color-field frequency multiplier; > 1 "
                             "adds texture finer than the init splats, "
                             "keeping densification scores alive")
    parser.add_argument("--static_caps", action="store_true",
                        help="disable adaptive capacity buckets: one "
                             "step compile per sh-degree instead of one "
                             "per bucket transition -- the right trade "
                             "for growth-heavy runs through the slow "
                             "remote-compile tunnel (densify-to-1M "
                             "crosses ~20 buckets; each recompile costs "
                             "more than the padding it saves)")
    parser.add_argument("--tile", type=str, default="16x32",
                        help="tile size HxW (16x32 suits the small "
                             "default frame; use 32x24 at garden scale, "
                             "PERF.md r3 sweep)")
    args = parser.parse_args(argv)

    import jax
    backend = args.backend or (
        "pallas" if jax.default_backend() == "tpu" else "jnp")
    interp = backend == "pallas" and jax.default_backend() != "tpu"

    from litegs_tpu import config as cfg
    from litegs_tpu.data import synthetic_train
    from litegs_tpu.training import statistics
    from litegs_tpu.training.trainer import Trainer

    t0 = time.time()
    data, init_xyz, init_color = synthetic_train.make_task(
        n_points=args.points, n_frames=args.frames, img_h=args.height,
        img_w=args.width, sh_degree=args.sh_degree, seed=0,
        backend=backend, interpret=interp,
        init_points=args.init_points, color_freq=args.color_freq)
    print(f"scene built in {time.time()-t0:.1f}s", flush=True)

    lp = cfg.ModelParams(sh_degree=args.sh_degree)
    op = cfg.OptimizationParams(iterations=args.iters,
                                position_lr_max_steps=args.iters)
    th, tw = map(int, args.tile.split("x"))
    pp = cfg.PipelineParams(raster_backend=backend, tile_size=(th, tw),
                            adaptive_capacity=not args.static_caps)
    total_epochs = max(args.iters // args.frames, 1)
    dp = cfg.DensifyParams(densification_interval=4, densify_from=3,
                           densify_until=int(total_epochs * 0.7),
                           opacity_reset_interval=10 ** 9,
                           target_primitives=args.target,
                           densify_mode=args.densify_mode)
    caps = cfg.auto_capacity(max(args.target, args.points) + 1)
    trainer = Trainer(lp=lp, op=op, pp=pp, dp=dp, caps=caps, data=data,
                      spatial_lr_scale=4.0, interpret=interp)
    state = trainer.init_state(init_xyz, init_color)
    stats = statistics.init_stats(caps.primitive_capacity)
    t0 = time.time()
    for epoch in range(trainer.total_epochs):
        state, stats, m = trainer.run_epoch(state, stats, epoch)
        state, stats = trainer.epoch_boundary(state, stats, epoch)
        if epoch % 10 == 0 or epoch == trainer.total_epochs - 1:
            print(f"[epoch {epoch:4d}] psnr={m['psnr']:.2f} "
                  f"loss={m['loss']:.4f} active={int(state.active_count)} "
                  f"({time.time()-t0:.0f}s)", flush=True)
    iters = trainer.total_epochs * trainer.n_frames
    dt = time.time() - t0
    print(f"final train PSNR {m['psnr']:.2f} dB; {iters} iters in "
          f"{dt:.0f}s = {iters/dt:.2f} it/s; overflows="
          f"{trainer.overflow_count}", flush=True)


if __name__ == "__main__":
    main()
