"""Torch-free .pt reader vs real torch saves: values, dtypes, strides, stubs."""

import argparse

import numpy as np
import pytest

from fitclip_tpu.convert.pt_reader import load_pt, load_pt_state_dict


@pytest.fixture()
def checkpoint(tmp_path):
    import torch

    torch.manual_seed(0)
    path = tmp_path / "model.pt"
    state = {
        "w_fp32": torch.randn(4, 5),
        "w_fp16": torch.randn(3, 3).half(),
        "w_bf16": torch.randn(2, 6).bfloat16(),
        "ids": torch.arange(10, dtype=torch.int64),
        "flag": torch.tensor(True),
        "scalar": torch.tensor(3.5),
        "noncontig": torch.randn(4, 6).t(),  # transposed (strided) tensor
    }
    torch.save(state, path)
    return path, {k: v for k, v in state.items()}


def test_values_match_torch(checkpoint):
    import torch

    path, expected = checkpoint
    loaded = load_pt(str(path))
    for key, tensor in expected.items():
        ref = tensor.float().numpy() if tensor.dtype == torch.bfloat16 \
            else tensor.numpy()
        np.testing.assert_array_equal(np.asarray(loaded[key], np.float32)
                                      if key == "w_bf16" else loaded[key], ref)


def test_dtypes(checkpoint):
    path, _ = checkpoint
    loaded = load_pt(str(path))
    assert loaded["w_fp32"].dtype == np.float32
    assert loaded["w_fp16"].dtype == np.float16
    assert loaded["ids"].dtype == np.int64
    assert str(loaded["w_bf16"].dtype) == "bfloat16"


def test_lightning_checkpoint_with_unpicklable_classes(tmp_path):
    import torch

    path = tmp_path / "train.ckpt"
    torch.save({
        "state_dict": {"encoder.model.weight": torch.ones(2, 2),
                       "encoder.model.bias": torch.zeros(2)},
        "hyper_parameters": argparse.Namespace(lr=1e-4, model="CLIP"),
        "epoch": 3,
    }, path)
    state_dict = load_pt_state_dict(str(path), strip_prefix="encoder.model.")
    assert set(state_dict) == {"weight", "bias"}
    np.testing.assert_array_equal(state_dict["weight"], np.ones((2, 2), np.float32))

    raw = load_pt(str(path))
    assert raw["epoch"] == 3
    hp = raw["hyper_parameters"]
    assert hp.lr == 1e-4  # stubbed Namespace still carries its attributes
    assert hp.model == "CLIP"


def test_no_code_execution_for_unknown_classes(tmp_path):
    # A checkpoint referencing an arbitrary callable must NOT execute it.
    import torch

    path = tmp_path / "evil.pt"
    torch.save({"obj": argparse.Namespace(x=1)}, path)
    loaded = load_pt(str(path))
    assert type(loaded["obj"]).__name__.startswith("Stub_")
