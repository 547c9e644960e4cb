#!/usr/bin/env python
"""Culling ablation (reference scripts/ablations_culling.py): run a scene
with the pure-jnp reference rasterizer path and with coarse chunk culling
effectively disabled (every chunk kept), to quantify the clustered
frustum-culling win."""
import argparse
import os
import subprocess
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--source_path", required=True)
    parser.add_argument("-m", "--model_path", default="ablation_culling")
    parser.add_argument("--iterations", type=int, default=10000)
    args, extra = parser.parse_known_args(argv)
    variants = {
        "clustered": [],
        # every chunk kept: quantifies the frustum-culling win (the
        # reference's --cluster_size 0 point, ablations_culling.py:75;
        # chunking itself is structural on TPU so only culling is ablated)
        "no_culling": ["--disable_culling"],
        # pure-jnp rasterizer path (the reference's script-path ablation)
        "script_raster": ["--raster_backend", "jnp"],
    }
    for name, flags in variants.items():
        cmd = [sys.executable, "example_train.py", "-s", args.source_path,
               "-m", os.path.join(args.model_path, name), "--eval",
               "--iterations", str(args.iterations)] + flags + extra
        print(f"=== {name} ===", flush=True)
        subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
