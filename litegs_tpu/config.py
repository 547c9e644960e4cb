"""Configuration system for litegs_tpu.

TPU-native re-design of the reference's reflection-based argparse groups
(reference: litegs/arguments.py:8-112). We keep the same four parameter
groups and default values so a LiteGS user finds identical knobs, but use
frozen dataclasses (hashable -> usable as jit static args) instead of
mutable reflection classes, and add a fifth TPU-specific group
(:class:`CapacityParams`) that replaces the reference's GPU-driven dynamic
allocation (reference: litegs/data.py:236-245, compact.cu:527-551) with
static padded capacities -- the TPU/XLA equivalent of the same feedback
idea (see ARCHITECTURE.md).
"""
from __future__ import annotations

import dataclasses
from argparse import ArgumentParser
from typing import Optional


@dataclasses.dataclass(frozen=True)
class ModelParams:
    """Scene/model-level options (reference: litegs/arguments.py:58-67)."""

    sh_degree: int = 3
    source_path: str = ""
    model_path: str = ""
    images: str = "images"
    resolution: int = -1
    white_background: bool = False
    eval: bool = False
    # shorthand flags, as in the reference (leading '_' convention)
    _shorthand = {"source_path": "-s", "model_path": "-m", "images": "-i",
                  "resolution": "-r", "white_background": "-w"}


@dataclasses.dataclass(frozen=True)
class PipelineParams:
    """Render pipeline options (reference: litegs/arguments.py:69-78)."""

    cluster_size: int = 128
    tile_size: tuple[int, int] = (8, 16)
    sparse_grad: bool = True
    device_preload: bool = True
    enable_transmitance: bool = False
    enable_depth: bool = False
    input_color_type: str = "sh"  # 'rgb' or 'sh'
    # TPU-specific: which rasterizer backend to use.
    # 'pallas' = hand-written TPU kernels; 'jnp' = pure-jnp reference path
    # (the analogue of the reference's call_script path, wrapper.py:21-164).
    raster_backend: str = "pallas"
    # TPU-specific: per-epoch capacity bucketing from observed sizes (the
    # static-shape analogue of the reference's GPU-driven feedback buffers,
    # data.py:236-245). Off -> always use the configured CapacityParams.
    adaptive_capacity: bool = True
    # Over-allocation margin on observed sizes (reference: x1.2 culling /
    # x1.5 binning feedback, compact.cu:535 / binning.cu:152).  Every
    # binning scan/sort/gather scales with CAPACITY, so slack is pure
    # overhead: 1.25 -> 1.1 measured +11% train throughput, 1.1 -> 1.05
    # a further +2.7% (4.39 -> 4.51 it/s, PERF.md r3), and on-chip
    # convergence runs with densification at 1.05 show zero overflows --
    # the trend-extrapolated feedback plus the post-densify/post-overflow
    # cushions absorb growth (overflow is safe regardless: the step
    # no-ops and the frame retries at a 1.5x-margined bucket).
    capacity_margin: float = 1.05
    # Ablation: keep every chunk (skip the frustum-culling test).  The
    # TPU equivalent of the reference's non-clustered `--cluster_size 0`
    # ablation point (ablations_culling.py:75) -- chunking itself stays
    # (static shapes require it) but the culling win is removed.
    disable_culling: bool = False
    # Multi-chip dispatch for training.start(): 'auto' uses the
    # data-parallel ParallelTrainer whenever jax.device_count() > 1,
    # 'on' forces it (errors if impossible), 'off' always trains
    # single-chip.  Pose refinement (op.learnable_viewproj) is
    # single-chip-only and falls back under 'auto'.
    parallel: str = "auto"
    # Views per optimizer step through ONE raster launch (the reference's
    # batch axis B, raster.cu:182).  B > 1 amortizes per-dispatch fixed
    # costs; semantics = mean gradient of B views (identical to the mesh
    # data-parallel step with D=B on one chip).  Pallas backend only;
    # pose refinement unsupported -- the trainer falls back to B=1.
    batch_views: int = 1
    # Wire dtype of the data-parallel gradient all-reduce: 'bf16' halves
    # the per-step ICI volume (the psum is synchronous on this XLA
    # version, ICI_OVERLAP_r4; gradients feed Adam's scale-invariant
    # m/sqrt(v), and equal-updates convergence parity is pinned in the
    # suite), 'f32' keeps the exact mean.
    grad_allreduce_dtype: str = "bf16"


@dataclasses.dataclass(frozen=True)
class OptimizationParams:
    """Optimizer options (reference: litegs/arguments.py:80-93)."""

    iterations: int = 30000
    position_lr_init: float = 0.00016
    position_lr_final: float = 0.0000016
    position_lr_max_steps: int = 30000
    feature_lr: float = 0.0025
    opacity_lr: float = 0.025
    scaling_lr: float = 0.005
    rotation_lr: float = 0.001
    lambda_dssim: float = 0.2
    reg_weight: float = 0.0
    learnable_viewproj: bool = False
    pose_lr: float = 1e-4  # SparseAdam lr for extrinsics (trainer.py:89)


@dataclasses.dataclass(frozen=True)
class DensifyParams:
    """Densification options (reference: litegs/arguments.py:95-112)."""

    densification_interval: int = 5
    densify_from: int = 3
    densify_until: int = -1
    # 'taming' = budgeted score sampling (what the reference trainer uses,
    # trainer.py:96); 'official' = original-3DGS grad-threshold clone/split
    # (the reference's DensityControllerOfficial reads a statistic nothing
    # produces, densify.py:123; here the signal is actually wired)
    densify_mode: str = "taming"
    opacity_reset_interval: int = 10
    opacity_reset_mode: str = "decay"  # 'decay' | 'reset'
    prune_mode: str = "weight"         # 'weight' | 'threshold'
    target_primitives: int = 1000000
    # legacy thresholds (official-ADC mode)
    densify_grad_threshold: float = 0.00015
    opacity_threshold: float = 0.005
    screen_size_threshold: int = 128
    percent_dense: float = 0.01


@dataclasses.dataclass(frozen=True)
class CapacityParams:
    """Static capacities for the TPU pipeline.

    The reference sizes its buffers dynamically with pinned-memory feedback
    (litegs/data.py:236-245; binning.cu:137-169; compact.cu:527-551).  Under
    XLA everything must be statically shaped, so we instead fix capacities up
    front and mask.  ``auto_capacity()`` derives sane values from the target
    primitive count.

    Attributes:
      primitive_capacity: max primitives N_cap (multiple of chunk_size*128).
      visible_capacity:   max visible primitives per view M_cap.
      row_capacity:       max (point, tile-row) pairs per view.
      entry_capacity:     max (point, tile) pairs per view (binning table).
    """

    primitive_capacity: int = 0
    visible_capacity: int = 0
    row_capacity: int = 0
    entry_capacity: int = 0

    def validate(self) -> None:
        assert self.primitive_capacity % 128 == 0
        assert self.visible_capacity % 128 == 0
        assert self.entry_capacity % 128 == 0


def round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


# Depth-block size of the Pallas rasterizer grid: gaussians are processed
# in blocks of this many sorted entries, and the binning pads every tile's
# segment to a multiple of it.  Measured on-chip (bench.py, 1M points,
# 32x32 tiles): 128 -> 2.86 it/s, 256 -> 2.61 it/s -- the doubled VMEM
# footprint and coarser saturation early-out cost more than the halved
# grid steps and scan amortization save; 64 is structurally invalid (the
# packed-params block's lane dim must be a multiple of 128).  Keep 128.
# Env override is for experiments only.
import os as _os

RASTER_BLOCK = int(_os.environ.get("LITEGS_RASTER_BLOCK", "128"))

# Which rasterizer blend-math stages run on the MXU (matmul units) instead
# of VPU broadcast/reduce passes.  Stage chars: q(uadratic), c(umprod),
# a(ccumulate), s(uffix cumsum), g(1), d(_color), m(oments) -- see
# ops/raster_pallas.MXU_MODE.  Default "asgm" = the stages measured faster
# AT PARITY on-chip (scripts/microbench_mxu.py, PERF.md r4: fwd 43.6->40.8
# ms with 'a', bwd 63.4->54.9 ms with 'sgm', deviations <= 6e-6).  'q' is
# REJECTED on parity grounds (3e-3 image deviation: the HIGHEST bf16-split
# can't absorb the f1/fx term cancellation); 'c' and 'd' measured neutral
# to slower.  Env override is for experiments only.
RASTER_MXU_MODE = _os.environ.get("LITEGS_RASTER_MXU", "asgm")

# Binning expansion backend: streaming Pallas window kernels (1) vs the XLA
# scatter+cummax+row-gather pipeline (0).  The streaming kernels exploit
# the monotone non-decreasing owner structure of the two expansions to
# replace random per-index gathers (~7.5 ns/index floor) with sequential
# window reads; see ops/stream_gather.expand_attrs_windowed.
BINNING_STREAM = _os.environ.get("LITEGS_BINNING_STREAM", "0") == "1"


def auto_capacity(target_primitives: int,
                  visible_frac: float = 0.9,
                  rows_per_visible: float = 3.0,
                  entries_per_visible: float = 7.0) -> CapacityParams:
    """Derive static capacities from a primitive budget.

    Defaults are deliberately generous; the trainer reports overflow counters
    so users can shrink them (the static-shape analogue of the reference's
    1.2x/1.5x feedback over-allocation, compact.cu:535, binning.cu:152).
    """
    n_cap = round_up(int(target_primitives * 1.08), 128 * 128)
    m_cap = round_up(int(n_cap * visible_frac), 128)
    return CapacityParams(
        primitive_capacity=n_cap,
        visible_capacity=m_cap,
        row_capacity=round_up(int(m_cap * rows_per_visible), 128),
        entry_capacity=round_up(int(m_cap * entries_per_visible), 128),
    )


def bucket_size(x: int, margin: float = 1.25, step: float = 1.1,
                align: int = 128) -> int:
    """Quantize a capacity to a geometric bucket grid.

    The TPU analogue of the reference's feedback over-allocation
    (compact.cu:535 x1.2, binning.cu:152 x1.5): observed size * margin,
    rounded UP to the bucket grid 128 * step^k so nearby sizes share one
    compiled program.  Slack bound = margin*step ~1.38x (round 1 shipped
    1.95x) -- every binning scan/sort/gather scales with CAPACITY, not
    true size, so slack is pure overhead.  Slimmer margins are safe
    because an overflowed step is a no-op that gets retried at a bigger
    bucket (overflow-safe stepping), and the per-frame running max keeps
    the compiled-variant count small.
    """
    import math
    need = max(int(x * margin), align)
    k = math.ceil(math.log(need / align) / math.log(step))
    return round_up(int(align * step ** max(k, 0)) + 1, align)


def bucketed_capacity(primitive_capacity: int, observed_visible: int,
                      observed_rows: int, observed_entries: int,
                      margin: float = 1.25) -> CapacityParams:
    """Derive bucketed capacities from observed per-view maxima."""
    return CapacityParams(
        primitive_capacity=primitive_capacity,
        visible_capacity=min(bucket_size(observed_visible, margin),
                             round_up(primitive_capacity, 128)),
        row_capacity=bucket_size(observed_rows, margin),
        entry_capacity=bucket_size(observed_entries, margin),
    )


def get_default_arg():
    """Default bundle (reference: litegs/config/__init__.py:3-8)."""
    return (ModelParams(), OptimizationParams(), PipelineParams(),
            DensifyParams())


def get_quality_arg():
    """Quality bundle (reference: litegs/config/__init__.py:10-16)."""
    dp = dataclasses.replace(DensifyParams(), target_primitives=4000000)
    op = dataclasses.replace(OptimizationParams())
    return ModelParams(), op, PipelineParams(), dp


# ---------------------------------------------------------------------------
# CLI plumbing: dataclass fields -> argparse flags (mirrors the reference's
# reflection convention, litegs/arguments.py:10-35).
# ---------------------------------------------------------------------------

_GROUPS = (ModelParams, OptimizationParams, PipelineParams, DensifyParams)


def add_cmdline_args(parser: ArgumentParser) -> None:
    seen = set()
    for cls in _GROUPS:
        group = parser.add_argument_group(cls.__name__)
        shorthand = getattr(cls, "_shorthand", {})
        for f in dataclasses.fields(cls):
            if f.name in seen:
                continue
            seen.add(f.name)
            names = ["--" + f.name]
            if f.name in shorthand:
                names.append(shorthand[f.name])
            if f.type in ("bool", bool):
                group.add_argument(*names, default=f.default,
                                   action="store_true")
            elif f.type in ("tuple[int, int]",):
                group.add_argument(*names, default=f.default, type=int,
                                   nargs=2)
            else:
                ty = {"int": int, "float": float, "str": str}.get(
                    f.type, type(f.default))
                group.add_argument(*names, default=f.default, type=ty)


def extract_groups(args) -> tuple[ModelParams, OptimizationParams,
                                  PipelineParams, DensifyParams]:
    out = []
    for cls in _GROUPS:
        kwargs = {}
        for f in dataclasses.fields(cls):
            if hasattr(args, f.name):
                v = getattr(args, f.name)
                if f.name == "tile_size" and isinstance(v, list):
                    v = tuple(v)
                kwargs[f.name] = v
        out.append(cls(**kwargs))
    return tuple(out)
