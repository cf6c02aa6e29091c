"""Frame-sampler index math parity vs torch-formula oracles.

The oracle re-derives the reference's linspace/round/resample arithmetic with
torch ops inside the test, then the numpy implementations must match exactly —
frame-index drift breaks retrieval parity silently.
"""

import itertools

import numpy as np
import pytest
import torch

from fitclip_tpu.data.frame_sampler import (
    ConsecutiveFrameSampler,
    FixedFrameFromUniformIntervalsFrameSampler,
    RandomFromUniformIntervalsFrameSampler,
    UniformFrameSampler,
    resample_indices,
)


def _torch_uniform(start, end, max_frames):
    num_frames = min(max_frames, end - start + 1)
    ticks = torch.linspace(start, end, steps=num_frames + 1, dtype=torch.int)
    return [int(torch.round((a + b) / 2)) for a, b in zip(ticks[:-1], ticks[1:])]


@pytest.mark.parametrize("start,end,max_frames", [
    (0, 99, 4), (0, 3, 4), (0, 0, 4), (0, 2, 4), (5, 250, 4),
    (0, 1000, 16), (7, 8, 4), (0, 149, 8), (3, 1000003, 4),
])
def test_uniform_sampler_matches_torch(start, end, max_frames):
    sampler = UniformFrameSampler(max_frames)
    assert list(sampler(start, end, fps=30.0)) == _torch_uniform(start, end, max_frames)


def test_uniform_sampler_fuzz():
    rng = np.random.default_rng(0)
    for _ in range(300):
        start = int(rng.integers(0, 1000))
        end = start + int(rng.integers(0, 5000))
        max_frames = int(rng.integers(1, 33))
        sampler = UniformFrameSampler(max_frames)
        assert list(sampler(start, end, fps=30.0)) == _torch_uniform(start, end, max_frames)


def test_random_sampler_bounds_and_count():
    rng = np.random.default_rng(1)
    sampler = RandomFromUniformIntervalsFrameSampler(4)
    for _ in range(100):
        start = int(rng.integers(0, 100))
        end = start + int(rng.integers(0, 500))
        indices = sampler(start, end, fps=30.0, rng=rng)
        assert len(indices) == min(4, end - start + 1)
        assert all(start <= i <= end for i in indices)
        assert indices == sorted(indices)


def test_fixed_frame_sampler_matches_torch():
    for start, end, max_frames, offset in [(0, 99, 4, 0), (0, 99, 4, 2), (10, 500, 8, 1)]:
        num_frames = min(max_frames, end - start + 1)
        ticks = torch.linspace(start, end + 1, steps=num_frames + 1, dtype=torch.int)
        expected = (ticks[:-1] + offset).tolist()
        sampler = FixedFrameFromUniformIntervalsFrameSampler(max_frames, offset)
        assert list(sampler(start, end, fps=30.0)) == expected


def _torch_resample(num_frames, original_fps, new_fps):
    # torchvision VideoClips._resample_video_idx semantics.
    step = original_fps / new_fps
    if step.is_integer():
        step = int(step)
        return list(range(0, num_frames * step, step))
    idxs = torch.arange(num_frames, dtype=torch.float32) * step
    return idxs.floor().to(torch.int64).tolist()


@pytest.mark.parametrize("num_frames,orig,new", [
    (16, 30.0, 5), (16, 25.0, 5), (32, 30.0, 30), (16, 29.97, 5), (8, 24.0, 10),
])
def test_resample_matches_torchvision_semantics(num_frames, orig, new):
    assert list(resample_indices(num_frames, orig, new)) == _torch_resample(num_frames, orig, new)


def _torch_consecutive(start_frame, end_frame, fps, max_frames, target_fps):
    if target_fps:
        indices = _torch_resample(max_frames, fps, target_fps)
    else:
        indices = list(range(max_frames))
    smallest_possible_end = min(end_frame, start_frame + indices[-1])
    start = start_frame + (end_frame - smallest_possible_end) // 2
    return list(itertools.takewhile(lambda i: i <= end_frame, (start + i for i in indices)))


@pytest.mark.parametrize("start,end,fps,max_frames,target_fps", [
    (0, 299, 30.0, 16, 5), (0, 40, 30.0, 16, 5), (0, 999, 25.0, 32, 30),
    (10, 200, 29.97, 16, 5), (0, 100, 30.0, 16, None),
])
def test_consecutive_sampler_matches_reference_math(start, end, fps, max_frames, target_fps):
    sampler = ConsecutiveFrameSampler(max_frames, fps=target_fps)
    assert list(sampler(start, end, fps)) == _torch_consecutive(start, end, fps, max_frames, target_fps)
