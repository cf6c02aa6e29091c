#!/usr/bin/env python
"""Strip the open_clip training wrapper prefix ("model."/"module.") from a
checkpoint's state dict (reference scripts/open_clip_checkpoint_to_model.py)."""
import argparse


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_path", metavar="INPUT_FILE")
    parser.add_argument("output_path", metavar="OUTPUT_FILE")
    return parser.parse_args()


def main() -> None:
    import torch

    args = parse_args()
    checkpoint = torch.load(args.input_path, map_location="cpu", weights_only=False)
    state_dict = checkpoint["state_dict"] if "state_dict" in checkpoint else checkpoint
    first_key = next(iter(state_dict))
    prefix = next(p for p in ("model", "module") if first_key.startswith(p + "."))
    torch.save({k[len(prefix) + 1:]: v for k, v in state_dict.items()},
               args.output_path)


if __name__ == "__main__":
    main()
