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
