#!/usr/bin/env python
"""The headline ~50s-per-scene configuration (reference
scripts/full_eval_aggressive.py:74-76): 10k iterations, densify every 2nd
epoch, fast xyz lr decay, 1M primitives.  Forwards to full_eval.py."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import full_eval  # noqa: E402

if __name__ == "__main__":
    full_eval.main(sys.argv[1:] + [
        "--iterations", "10000", "--primitives", "1000000",
        "--", "--position_lr_max_steps", "10000",
        "--position_lr_final", "0.000016",
        "--densification_interval", "2",
    ])
