"""litegs_tpu: a TPU-native 3D Gaussian Splatting framework.

Built from scratch in JAX / Pallas / pjit with the capabilities of the
LiteGS reference trainer (MooreThreads/LiteGS): full training loop,
tile-binned differentiable rasterizer (forward + analytic backward),
chunked frustum culling, score-based budgeted densification, sparse Adam,
COLMAP/PLY IO, an eval harness -- plus multi-chip data parallelism over a
``jax.sharding.Mesh`` that the single-GPU reference does not have.
"""
from . import config, data, io, ops, parallel, render, scene, training, utils

__version__ = "0.1.0"

__all__ = ["config", "data", "io", "ops", "parallel", "render", "scene",
           "training", "utils"]
