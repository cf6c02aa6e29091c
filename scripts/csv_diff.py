#!/usr/bin/env python
"""Rows of CSV 1 whose key column doesn't appear in CSV 2 (reference
scripts/csv_diff.py) — e.g. building webvid_without_4_5k splits."""
import argparse
import sys

import pandas as pd


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_path1", metavar="INPUT_FILE_1")
    parser.add_argument("input_path2", metavar="INPUT_FILE_2")
    parser.add_argument("--key", default="videoid")
    return parser.parse_args()


def main() -> None:
    args = parse_args()
    df1 = pd.read_csv(args.input_path1)
    df2 = pd.read_csv(args.input_path2)
    df1[~df1[args.key].isin(df2[args.key])].to_csv(sys.stdout, index=False)


if __name__ == "__main__":
    main()
