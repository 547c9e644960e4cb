#!/usr/bin/env python
"""On-chip numerical parity check: compiled Pallas kernels and the SSIM
loss vs their pure-jnp oracles, on the REAL device.

The CPU test suite runs Pallas in interpret mode (exact f32) and so can
never catch hardware-lowering precision hazards.  Both XLA:TPU and Mosaic
multiply f32 through the MXU in bf16 by default, which once cost 10% image
error / 30% gradient error and SSIM values beyond 4.0 -- run this after
any kernel or loss change:

    python scripts/tpu_parity_check.py
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tests"))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402


def check_raster(tile_h, tile_w):
    from litegs_tpu.ops import binning, raster
    from util_scenes import random_screen_gaussians
    img_h, img_w = 8 * tile_h, 4 * tile_w
    tiles_x = img_w // tile_w
    tiles_total = (img_h // tile_h) * tiles_x
    rng = np.random.default_rng(5)
    mean, inv, color, op, z, ndc = random_screen_gaussians(
        rng, 500, img_h, img_w, scale_px=(2.0, 10.0))
    table = binning.build_tile_table(ndc, z, inv, op, jnp.ones(500, bool),
                                     img_h, img_w, tile_h, tile_w,
                                     8192, 16384)
    assert not bool(table.overflow)

    def loss(backend):
        def f(mean, inv, color, op):
            col, trans, _ = raster.rasterize(
                mean, inv, color, op, table, tiles_total, tiles_x,
                tile_h, tile_w, backend=backend)
            return jnp.sum(col * 0.3) + jnp.sum(trans * 0.1), (col, trans)
        return f

    (_, (cj, tj)), gj = jax.value_and_grad(
        loss("jnp"), argnums=(0, 1, 2, 3), has_aux=True)(mean, inv, color,
                                                         op)
    (_, (cp, tp)), gp = jax.value_and_grad(
        loss("pallas"), argnums=(0, 1, 2, 3), has_aux=True)(mean, inv,
                                                            color, op)
    fwd = float(jnp.abs(cp - cj).max())
    print(f"  tile {tile_h}x{tile_w}: fwd maxdiff {fwd:.2e}")
    assert fwd < 5e-4, fwd
    for name, a, b in zip(["mean", "invcov", "color", "opacity"], gj, gp):
        s = float(jnp.abs(a).max()) + 1e-6
        rel = float(jnp.abs(a - b).max()) / s
        print(f"  tile {tile_h}x{tile_w}: grad {name} maxreldiff {rel:.2e}")
        assert rel < 2e-3, (name, rel)


def check_ssim():
    from litegs_tpu.ops import losses
    rng = np.random.default_rng(0)
    img = rng.random((3, 256, 384)).astype(np.float32)
    gt = rng.random((3, 256, 384)).astype(np.float32)
    for _ in range(3):
        img = 0.25 * (np.roll(img, 1, 1) + np.roll(img, -1, 1)
                      + np.roll(img, 1, 2) + np.roll(img, -1, 2))
        gt = 0.25 * (np.roll(gt, 1, 1) + np.roll(gt, -1, 1)
                     + np.roll(gt, 1, 2) + np.roll(gt, -1, 2))
    s_dev = float(jax.jit(losses.ssim)(jnp.asarray(img), jnp.asarray(gt)))
    with jax.default_device(jax.devices("cpu")[0]):
        s_cpu = float(jax.jit(losses.ssim)(jnp.asarray(img),
                                           jnp.asarray(gt)))
    print(f"  ssim device {s_dev:.6f} vs cpu {s_cpu:.6f}")
    assert abs(s_dev - s_cpu) < 1e-4, (s_dev, s_cpu)
    assert -1.0 <= s_dev <= 1.0, s_dev


if __name__ == "__main__":
    print(f"backend: {jax.default_backend()}")
    check_ssim()
    for th, tw in [(8, 16), (16, 32)]:
        check_raster(th, tw)
    print("ALL ON-CHIP PARITY CHECKS PASS")
