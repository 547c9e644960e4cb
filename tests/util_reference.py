"""Load the reference implementation's pure-torch script ops on CPU.

The reference package hard-requires its CUDA extensions at import time
(litegs/utils/wrapper.py:8-12) and allocates module-level tensors with
``device='cuda'`` (statistic_helper.py StatisticsHelperInst).  This shim
makes the *pure-torch* script paths importable on the CPU-only torch in
this environment by

  * stubbing the missing binary modules (litegs_fused, simple_knn,
    plyfile, fused_ssim) with empty placeholders -- only the script
    (pure-torch) code paths are ever called from the tests, and
  * patching the torch factory functions so ``device='cuda'`` allocations
    fall back to CPU.

Nothing in here executes reference *logic*; it only imports it so the
parity tests (tests/test_reference_parity.py) can run the reference's own
script implementations as the ground-truth oracle.
"""
from __future__ import annotations

import sys
import types

_REFERENCE_PATH = "/root/reference"
_loaded = None


def _patch_torch_cuda_factories():
    import torch

    if getattr(torch, "_litegs_tpu_cpu_patch", False):
        return
    for fname in ("zeros", "ones", "empty", "full", "arange", "tensor",
                  "randn", "rand", "randint", "linspace"):
        orig = getattr(torch, fname)

        def wrapper(*a, _orig=orig, **k):
            dev = k.get("device")
            if dev == "cuda" or (isinstance(dev, torch.device)
                                 and dev.type == "cuda"):
                k["device"] = "cpu"
            return _orig(*a, **k)

        setattr(torch, fname, wrapper)
    torch._litegs_tpu_cpu_patch = True


def load_reference():
    """Import litegs (the reference) with CUDA deps stubbed; returns the
    module dict {wrapper, utils, spherical_harmonics} or raises."""
    global _loaded
    if _loaded is not None:
        return _loaded
    if _REFERENCE_PATH not in sys.path:
        # APPEND (not prepend): the reference root contains example_train.py
        # etc. with the same names as this repo's entry scripts -- the
        # repo's must win any import race
        sys.path.append(_REFERENCE_PATH)
    _patch_torch_cuda_factories()
    for _ in range(40):
        try:
            import litegs  # noqa: F401
            import litegs.utils  # noqa: F401
            from litegs.utils import wrapper  # noqa: F401
            break
        except ModuleNotFoundError as e:
            m = types.ModuleType(e.name)
            m.__path__ = []
            m.__getattr__ = lambda n: object
            sys.modules[e.name] = m
            sys.modules.pop("litegs", None)
    import litegs.utils as ref_utils
    from litegs.utils import spherical_harmonics as ref_sh
    from litegs.utils import wrapper as ref_wrapper
    try:
        # pure-torch Morton codes (point.py:27-75); the module also pulls
        # the stubbed simple_knn, so guard the import
        from litegs.scene import point as ref_point
    except Exception:
        ref_point = None
    try:
        # pure-torch log-lerp lr scheduler (optimizer.py:46-71)
        from litegs.training import optimizer as ref_opt
    except Exception:
        ref_opt = None

    _loaded = {"wrapper": ref_wrapper, "utils": ref_utils, "sh": ref_sh,
               "point": ref_point, "opt": ref_opt}
    return _loaded
