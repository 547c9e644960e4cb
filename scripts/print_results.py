#!/usr/bin/env python
"""Aggregate full_eval CSVs into markdown tables with repeat-averaging
(reference scripts/print_results.py)."""
import argparse
import csv
import sys
from collections import defaultdict


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("csvs", nargs="+")
    parser.add_argument("--latex", action="store_true")
    args = parser.parse_args(argv)
    rows = defaultdict(list)
    for path in args.csvs:
        with open(path) as f:
            for row in csv.DictReader(f):
                rows[row["scene"]].append(row)
    cols = ["time_s", "test_ssim", "test_psnr", "test_lpips"]
    if args.latex:
        print("scene & " + " & ".join(cols) + r" \\")
    else:
        print("| scene | " + " | ".join(cols) + " |")
        print("|---" * (len(cols) + 1) + "|")
    for scene in sorted(rows):
        vals = []
        for c in cols:
            xs = [float(r[c]) for r in rows[scene]
                  if r.get(c) not in (None, "", "None")]
            vals.append(f"{sum(xs)/len(xs):.4g}" if xs else "n/a")
        if args.latex:
            print(f"{scene} & " + " & ".join(vals) + r" \\")
        else:
            print(f"| {scene} | " + " | ".join(vals) + " |")


if __name__ == "__main__":
    main()
