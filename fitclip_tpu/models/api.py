"""Encoder API: the contract between models, data pipeline, and train/eval steps.

Preserves the reference's key inversion — the encoder is the source of truth
for preprocessing (aligner/data/video_data_module.py:40-55 queries the encoder
for samplers/transforms/tokenizer) — but splits it TPU-style:

- `PreprocessSpec` is a plain data description (frame counts, geometry,
  normalization constants, pad policy) consumed by the host input pipeline and
  by the fused device-side preprocessing; no torch-style transform callables.
- Encoders are stateless wrappers around pure ``(params, inputs) -> embeddings``
  functions so they compose with jit/pjit/grad; parameters travel separately.
"""

import dataclasses
from abc import ABC, abstractmethod
from typing import Any, Callable, Iterator, Optional, Sequence, Tuple

import numpy as np

from fitclip_tpu.data.frame_sampler import FrameSampler

Params = Any
ArrayLike = Any


@dataclasses.dataclass(frozen=True)
class PreprocessSpec:
    """Everything the input pipeline needs to feed an encoder.

    Mirrors the reference encoder preprocessing contract
    (aligner/encoder/video_encoder.py:14-52) as data instead of callables.
    """
    num_frames: int
    image_size: int
    mean: Tuple[float, float, float]
    std: Tuple[float, float, float]
    train_frame_sampler: FrameSampler
    eval_frame_sampler: FrameSampler
    resize_mode: str = "bicubic"  # eval resize: short side to image_size, center crop
    train_crop_scale: Tuple[float, float] = (0.5, 1.0)  # RandomResizedCrop range
    should_pad_batch: bool = True  # pad variable-frame videos in collate
    pad_to_min_frames: Optional[int] = None  # e.g. MIL-NCE PadToMinFrames
    max_tokens: int = 77


class VideoTextEncoder(ABC):
    """A dual video/text encoder: stateless config + pure apply functions.

    Matches the reference surface (encode_video/encode_text/tokenize/decode,
    aligner/encoder/video_text_encoder.py:15-31) minus torch statefulness.
    """

    preprocess: PreprocessSpec

    @abstractmethod
    def init_params(self, rng) -> Params:
        raise NotImplementedError

    @abstractmethod
    def encode_video(self, params: Params, video: ArrayLike) -> ArrayLike:
        """video: (B, T, H, W, C) normalized frames -> (B, D) embeddings."""
        raise NotImplementedError

    @abstractmethod
    def encode_text(self, params: Params, text: ArrayLike) -> ArrayLike:
        """text: (B, L) token ids -> (B, D) embeddings."""
        raise NotImplementedError

    def apply(self, params: Params, video: ArrayLike, text: ArrayLike):
        return self.encode_video(params, video), self.encode_text(params, text)

    @abstractmethod
    def get_tokenizer(self) -> Callable[[Sequence[str]], np.ndarray]:
        raise NotImplementedError

    @abstractmethod
    def decode_text(self, ids) -> Iterator[str]:
        raise NotImplementedError
