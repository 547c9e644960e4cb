#!/usr/bin/env python
"""Speed-challenge training run (reference 3dgs_challenge_train.py): 5k
iterations, wall-clock written to JSON for the leaderboard harness."""
import argparse
import json
import os
import time

from litegs_tpu import config as cfg
from litegs_tpu import training


def main(argv=None):
    parser = argparse.ArgumentParser()
    cfg.add_cmdline_args(parser)
    parser.add_argument("--timing_json", type=str, default="train_time.json")
    args = parser.parse_args(argv)
    lp, op, pp, dp = cfg.extract_groups(args)
    import dataclasses
    op = dataclasses.replace(op, iterations=5000,
                             position_lr_max_steps=5000)
    t0 = time.time()
    training.start(lp, op, pp, dp)
    elapsed = time.time() - t0
    os.makedirs(os.path.dirname(args.timing_json) or ".", exist_ok=True)
    with open(args.timing_json, "w") as f:
        json.dump({"train_time_s": elapsed, "scene": lp.source_path}, f)
    print(f"challenge train: {elapsed:.1f}s")


if __name__ == "__main__":
    main()
