#!/usr/bin/env python
"""Densification ablation (reference scripts/ablations_densify.py:61):
official-ADC-style configuration -- densify every epoch, opacity 'reset'
mode, threshold prune -- vs the default TamingGS score-based control."""
import argparse
import os
import subprocess
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--source_path", required=True)
    parser.add_argument("-m", "--model_path", default="ablation_densify")
    parser.add_argument("--iterations", type=int, default=10000)
    args, extra = parser.parse_known_args(argv)
    variants = {
        "tamings": [],
        "official_adc": ["--densify_mode", "official",
                         "--densification_interval", "1",
                         "--opacity_reset_interval", "20",
                         "--opacity_reset_mode", "reset",
                         "--prune_mode", "threshold"],
    }
    for name, flags in variants.items():
        cmd = [sys.executable, "example_train.py", "-s", args.source_path,
               "-m", os.path.join(args.model_path, name), "--eval",
               "--iterations", str(args.iterations)] + flags + extra
        print(f"=== {name} ===", flush=True)
        subprocess.run(cmd, check=False)


if __name__ == "__main__":
    main()
