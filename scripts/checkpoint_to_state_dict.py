#!/usr/bin/env python
"""Extract the student encoder from a training checkpoint as a torch-format
state dict on stdout (reference scripts/checkpoint_to_state_dict.py surface).

Accepts either an orbax train-state directory produced by this framework or a
torch/Lightning .ckpt (then `--prefix` strips e.g. "encoder.model.").
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_path", metavar="INPUT_FILE")
    parser.add_argument("--prefix", default="encoder.model.")
    parser.add_argument("--output", default=None,
                        help="output file (default: stdout)")
    return parser.parse_args()


def main() -> None:
    import torch

    args = parse_args()
    if os.path.isdir(args.input_path):
        from fitclip_tpu.convert.flax_to_torch import clip_torch_state_dict_from_params
        from fitclip_tpu.training.checkpointing import restore_checkpoint

        restored = restore_checkpoint(args.input_path)
        params = restored["params"]["encoder"] if "params" in restored else restored
        state_dict = {k: torch.from_numpy(v)
                      for k, v in clip_torch_state_dict_from_params(params).items()}
    else:
        from fitclip_tpu.convert.torch_state_dict import load_torch_state_dict

        state_dict = {k: torch.from_numpy(v) for k, v in load_torch_state_dict(
            args.input_path, strip_prefix=args.prefix).items()}
    out = open(args.output, "wb") if args.output else sys.stdout.buffer
    torch.save(state_dict, out)


if __name__ == "__main__":
    main()
