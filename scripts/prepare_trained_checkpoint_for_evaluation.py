#!/usr/bin/env python
"""Training checkpoint -> evaluation-ready encoder state dict (the generic,
non-CLIP variant: no logit_scale surgery; reference
scripts/prepare_trained_checkpoint_for_evaluation.py). Accepts either an
orbax train-state directory or a torch .pt/.ckpt file and strips the
training-module prefix from every parameter name."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("input_path", metavar="INPUT_FILE")
    parser.add_argument("output_path", metavar="OUTPUT_FILE")
    parser.add_argument("--prefix", default="encoder.model.")
    return parser.parse_args()


def main() -> None:
    import torch

    args = parse_args()
    prefix = args.prefix + ("" if args.prefix.endswith(".") else ".")
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
            args.input_path, strip_prefix=prefix).items()}
    torch.save(state_dict, args.output_path)


if __name__ == "__main__":
    main()
