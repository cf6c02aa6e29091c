#!/usr/bin/env python
"""Randomly sample N rows from a CSV (reference scripts/sample_csv.py) —
used to build the WebVid subsample splits (webvid563 ... webvid380k)."""
import argparse

import pandas as pd


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_path", metavar="INPUT_FILE")
    parser.add_argument("output_path", metavar="OUTPUT_FILE")
    parser.add_argument("-n", "--size", type=int, required=True)
    parser.add_argument("--seed", type=int, default=42)
    return parser.parse_args()


def main() -> None:
    args = parse_args()
    df = pd.read_csv(args.input_path)
    df.sample(n=args.size, random_state=args.seed).to_csv(args.output_path, index=False)


if __name__ == "__main__":
    main()
