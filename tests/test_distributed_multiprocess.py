"""Real multi-PROCESS bring-up smoke on the CPU backend.

Everything else multi-chip in this suite runs on a virtual in-process
mesh; this test actually launches TWO Python processes, connects them
through ``parallel.initialize_distributed`` (the multi-host entry the
reference never had; explicit-arg failures must raise, not degrade), and
checks a cross-process psum over the global mesh plus the per-process
frame sharding of ``training.start.shard_frames_for_process``.

The child re-execs this file with a process id argument; the parent
(under the normal pytest conftest) only orchestrates subprocesses.
"""
import os
import socket
import subprocess
import sys

_CHILD = r"""
import os, sys
pid = int(sys.argv[1])
port = sys.argv[2]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
sys.path.insert(0, os.getcwd())  # parent sets cwd to the repo root

import jax
jax.config.update("jax_platforms", "cpu")

from litegs_tpu import parallel
from litegs_tpu.training.start import shard_frames_for_process

n = parallel.initialize_distributed(
    coordinator_address=f"127.0.0.1:{port}", num_processes=2,
    process_id=pid)
assert jax.process_count() == 2, jax.process_count()
assert n == jax.device_count() and n == 4, n

import numpy as np
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax.experimental import multihost_utils

mesh = parallel.make_mesh()
local = np.full((jax.local_device_count(), 1), float(pid + 1), np.float32)
garr = multihost_utils.host_local_array_to_global_array(
    local, mesh, P(parallel.DATA_AXIS))
got = float(jax.jit(jnp.sum)(garr))
want = sum((i + 1) * jax.local_device_count() for i in range(2))
assert got == want, (got, want)

frames = list(range(10))
assert shard_frames_for_process(frames) == frames[pid::2]
print(f"[p{pid}] DIST OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def test_two_process_bringup_and_psum(tmp_path):
    child = tmp_path / "dist_child.py"
    child.write_text(_CHILD)
    port = str(_free_port())
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    here = os.path.dirname(os.path.abspath(__file__))
    # cwd = repo root: the child adds it to sys.path to import litegs_tpu
    procs = [subprocess.Popen(
        [sys.executable, str(child), str(i), port],
        cwd=os.path.dirname(here), env=env,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True)
        for i in range(2)]
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=420)
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {i} failed:\n{out}"
        assert f"[p{i}] DIST OK" in out, out
