#!/usr/bin/env python
"""CLI training entry (reference example_train.py:7-27).

    python example_train.py -s <colmap_scene_dir> -m <output_dir> \
        --target_primitives 1000000 --iterations 10000
"""
import argparse
import sys

from litegs_tpu import config as cfg
from litegs_tpu import training


def parse_epoch_list(s):
    return [int(x) for x in s.split(",") if x] if s else []


def main(argv=None):
    parser = argparse.ArgumentParser(description="Train a 3DGS scene")
    cfg.add_cmdline_args(parser)
    parser.add_argument("--test_epochs", type=str, default="",
                        help="comma-separated epoch list for test PSNR")
    parser.add_argument("--save_epochs", type=str, default="",
                        help="comma-separated epoch list for ply export")
    parser.add_argument("--checkpoint_epochs", type=str, default="",
                        help="comma-separated epoch list for checkpoints")
    parser.add_argument("--start_checkpoint", type=str, default=None)
    args = parser.parse_args(argv)
    lp, op, pp, dp = cfg.extract_groups(args)
    if not lp.source_path:
        parser.error("--source_path/-s is required")
    training.start(lp, op, pp, dp,
                   test_epochs=parse_epoch_list(args.test_epochs),
                   save_epochs=parse_epoch_list(args.save_epochs),
                   checkpoint_epochs=parse_epoch_list(args.checkpoint_epochs),
                   start_checkpoint=args.start_checkpoint)


if __name__ == "__main__":
    main()
