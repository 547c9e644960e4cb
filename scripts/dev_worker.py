"""Persistent dev REPL worker: executes /tmp/wq/NNN.py as they appear.

Keeps the (slow-to-import on 1 CPU) JAX runtime warm between debug
snippets.  Globals persist across jobs.  Not part of the framework.
"""
import os
import sys
import time
import traceback

QUEUE = os.environ.get("WQ", "/tmp/wq")
os.makedirs(QUEUE, exist_ok=True)

os.environ["JAX_PLATFORMS"] = os.environ.get("WORKER_PLATFORM", "cpu")
os.environ.setdefault(
    "XLA_FLAGS", "--xla_force_host_platform_device_count=8")

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import jax  # noqa: E402

if os.environ["JAX_PLATFORMS"] != "axon":
    # the axon plugin overrides jax_platforms at import; pin it back
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

G = {"jax": jax, "jnp": jnp, "np": np}
print("WORKER READY", flush=True)

i = 0
while True:
    path = os.path.join(QUEUE, f"{i:03d}.py")
    if os.path.exists(path):
        print(f"=== exec {i} ===", flush=True)
        t0 = time.time()
        try:
            exec(compile(open(path).read(), path, "exec"), G)
        except Exception:
            traceback.print_exc()
        print(f"=== done {i} ({time.time()-t0:.1f}s) ===", flush=True)
        i += 1
    else:
        time.sleep(0.3)
