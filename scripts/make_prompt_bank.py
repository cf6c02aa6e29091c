#!/usr/bin/env python
"""Generate a prompt bank (one class name per line) from a dataset categories
file — the reference ships these as prompts/clip_ucf101.txt (101 lines) and
prompts/clip_kinetics700.txt (700 lines), consumed via cfg.prompts for
teacher-student prompt replacement (teacher_student.py:104-116)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("categories_file", metavar="CATEGORIES_FILE",
                        help="UCF classInd.txt ('1 ApplyEyeMakeup'), a Kinetics "
                             "category-per-line file, or a MiT 'category,id' CSV")
    parser.add_argument("output_path", metavar="OUTPUT_FILE")
    parser.add_argument("--format", choices=["ucf", "lines", "csv"], default="lines")
    return parser.parse_args()


def main() -> None:
    args = parse_args()
    names = []
    with open(args.categories_file) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            if args.format == "ucf":
                from fitclip_tpu.data.datasets.ucf import folder_name_to_category

                names.append(folder_name_to_category(line.split()[1]))
            elif args.format == "csv":
                names.append(line.split(",")[0])
            else:
                names.append(line)
    with open(args.output_path, "w") as f:
        f.write("\n".join(names) + "\n")
    print(f"wrote {len(names)} prompts to {args.output_path}")


if __name__ == "__main__":
    main()
