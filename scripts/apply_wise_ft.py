#!/usr/bin/env python
"""Offline WiSE-FT: merge two CLIP checkpoints in weight space
(reference scripts/apply_wise_ft.py; https://arxiv.org/abs/2109.01903)."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_path1", metavar="INPUT_FILE_1")
    parser.add_argument("input_path2", metavar="INPUT_FILE_2")
    parser.add_argument("output_path", metavar="OUTPUT_FILE")
    parser.add_argument("--weight-for-2", type=float, default=0.5)
    return parser.parse_args()


def main() -> None:
    import torch

    from fitclip_tpu.convert.torch_state_dict import load_torch_state_dict

    args = parse_args()
    sd1 = load_torch_state_dict(args.input_path1)
    sd2 = load_torch_state_dict(args.input_path2)
    sd1.pop("logit_scale", None)
    sd2.pop("logit_scale", None)
    if set(sd1) != set(sd2):
        raise SystemExit("Checkpoints have different parameter sets: "
                         f"{sorted(set(sd1) ^ set(sd2))[:10]} ...")
    w = args.weight_for_2
    merged = {k: torch.from_numpy((1 - w) * sd1[k] + w * sd2[k]) for k in sd1}
    merged["logit_scale"] = torch.tensor(float("nan"))
    torch.save(merged, args.output_path)


if __name__ == "__main__":
    main()
