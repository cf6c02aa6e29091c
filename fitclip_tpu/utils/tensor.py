"""Small array utilities (host + device).

TPU-native replacements for the reference's ``util/tensor_utils.py``. The
reference's ``all_gather`` wrapper (tensor_utils.py:48-66) has no equivalent
here by design: inside a jitted SPMD step, ``jax.lax.all_gather(x, axis)`` is
already differentiable and shape-stable, so the subsystem disappears.
"""

from typing import Sequence, Union

import numpy as np


Array = Union[np.ndarray, "jax.Array"]  # noqa: F821


def pad_axis_to(x: np.ndarray, size: int, axis: int = 0, value=0) -> np.ndarray:
    """Right-pad ``axis`` of ``x`` up to at least ``size`` (reference
    ``util/tensor_utils.py:11-21`` semantics)."""
    current = x.shape[axis]
    if current >= size:
        return x
    pad_width = [(0, 0)] * x.ndim
    pad_width[axis] = (0, size - current)
    return np.pad(x, pad_width, constant_values=value)


def stack_padded(arrays: Sequence[np.ndarray], value=0) -> np.ndarray:
    """Stack variable-length-first-axis arrays, right-padding to the longest
    (torch ``pad_sequence(batch_first=True)`` semantics used by the reference
    video collate, video_dataset.py:102-112)."""
    max_len = max(a.shape[0] for a in arrays)
    return np.stack([pad_axis_to(a, max_len, axis=0, value=value) for a in arrays])
