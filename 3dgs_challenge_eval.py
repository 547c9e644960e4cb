#!/usr/bin/env python
"""Speed-challenge evaluation (reference 3dgs_challenge_eval.py:12-36):
score the trained model and merge metrics with the recorded train time."""
import argparse
import json
import subprocess
import sys


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("-s", "--source_path", required=True)
    parser.add_argument("-m", "--model_path", required=True)
    parser.add_argument("--timing_json", type=str, default="train_time.json")
    parser.add_argument("--output_json", type=str, default="challenge.json")
    args, extra = parser.parse_known_args(argv)
    out = subprocess.run(
        [sys.executable, "example_metrics.py", "-s", args.source_path,
         "-m", args.model_path, "--skip_train"] + extra,
        capture_output=True, text=True)
    print(out.stdout)
    import re
    m = re.search(r"test: SSIM ([0-9.]+)\s+PSNR ([0-9.]+)", out.stdout)
    result = {}
    try:
        with open(args.timing_json) as f:
            result.update(json.load(f))
    except OSError:
        pass
    if m:
        result["ssim"], result["psnr"] = float(m.group(1)), float(m.group(2))
    with open(args.output_json, "w") as f:
        json.dump(result, f, indent=2)
    print(json.dumps(result))


if __name__ == "__main__":
    main()
