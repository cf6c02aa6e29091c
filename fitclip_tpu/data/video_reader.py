"""Video/image readers: path -> indexed uint8 frames.

Protocol mirrors the reference reader surface (aligner/data/video_reader.py:
18-117): indexed ``get_batch``-style reads, ``time_to_indices`` seek math,
average fps, and error tolerance — unreadable media decodes to zero frames of
shape (len(indices), 256, 256, 3) instead of raising, so training never dies
on a corrupt sample.

Backends, in dispatch order:
1. native C++ FFmpeg extension (fitclip_tpu.data.native) when built — the
   decord equivalent (SURVEY §2.9);
2. OpenCV ``VideoCapture`` (FFmpeg build) as the always-available fallback;
3. PIL/OpenCV still-image reader (images are 1-frame videos, e.g. CC3M).

Frames are numpy uint8 HWC — no torch anywhere in the pipeline.
"""

import logging
import os
from abc import ABC, abstractmethod
from typing import Optional, Sequence, Union

import numpy as np

LOGGER = logging.getLogger(__name__)

IMAGE_EXTENSIONS = (".jpg", ".jpeg", ".png", ".ppm", ".bmp", ".pgm", ".tif",
                    ".tiff", ".webp")

_FALLBACK_SHAPE = (256, 256, 3)


class VideoReader(ABC):
    def __init__(self, path) -> None:
        self.path = str(path)

    @abstractmethod
    def __call__(self, indices: Sequence[int]) -> np.ndarray:
        """Decode the given frame indices -> (len(indices), H, W, 3) uint8."""
        raise NotImplementedError

    @abstractmethod
    def __len__(self) -> int:
        raise NotImplementedError

    @abstractmethod
    def time_to_indices(self, time: Union[float, Sequence[float]]) -> np.ndarray:
        raise NotImplementedError

    @property
    def ok(self) -> bool:
        """Whether the container opened and is decodable. Failed opens stay
        usable (zero-fill failure tolerance, the decord-parity batch-eval
        semantics) — online callers that would rather REJECT a bad video
        than embed zeros (demo/embed_service.py) check this instead."""
        return True

    @abstractmethod
    def get_avg_fps(self) -> float:
        raise NotImplementedError

    @staticmethod
    def from_path(path, short_side: Optional[int] = None) -> "VideoReader":
        """short_side: decode-time aspect-preserving downscale to this short
        side (swscale inside the native decoder — one YUV->RGB+scale pass at
        OUTPUT resolution instead of full-res conversion + a separate resize
        pass). Opt-in speed knob (``++data.decode_short_side=N``): swscale
        bicubic differs from the transform's cv2 bicubic at the last bit, so
        bit-parity paths leave it unset. Never upscales."""
        if str(path).lower().endswith(IMAGE_EXTENSIONS):
            return ImageVideoReader(path)
        native = _native_reader()
        if native is not None:
            return native(path, short_side=short_side)
        return OpenCVVideoReader(path, short_side=short_side)


def scaled_size(height: int, width: int, short_side: int):
    """Aspect-preserving (h, w) with min side == short_side; never upscales."""
    if height <= 0 or width <= 0 or min(height, width) <= short_side:
        return height, width
    if height <= width:
        return short_side, max(1, round(width * short_side / height))
    return max(1, round(height * short_side / width)), short_side


def _native_reader():
    """The C++ FFmpeg extension class, or None if not built."""
    try:
        from fitclip_tpu.data.native import NativeVideoReader
        return NativeVideoReader
    except Exception:
        return None


def _nearest_indices(times: np.ndarray, time) -> np.ndarray:
    """decord-compatible nearest-frame search (video_reader.py:76-81 math):
    searchsorted, then step back unless the right neighbour is closer."""
    indices = np.searchsorted(times, time)
    indices = np.minimum(indices, len(times) - 1)
    return np.where(np.bitwise_or(indices == 0,
                                  times[indices] - time <= time - times[np.maximum(indices - 1, 0)]),
                    indices, indices - 1)


class OpenCVVideoReader(VideoReader):
    """cv2.VideoCapture-backed reader. Frame timestamps are synthesized as
    (i + 0.5) / fps (frame midpoints), matching decord's mean of per-frame
    (start, end) timestamps for constant-frame-rate streams."""

    def __init__(self, path, short_side: Optional[int] = None) -> None:
        super().__init__(path)
        import cv2

        self._cv2 = cv2
        self.short_side = short_side
        self.capture = None
        try:
            capture = cv2.VideoCapture(self.path)
            if capture.isOpened() and capture.get(cv2.CAP_PROP_FRAME_COUNT) > 0:
                self.capture = capture
            else:
                capture.release()
                LOGGER.error("An error occurred when trying to load the video "
                             "with path %s.", self.path)
        except Exception:
            LOGGER.error("An error occurred when trying to load the video "
                         "with path %s.", self.path)

    @property
    def ok(self) -> bool:
        return self.capture is not None

    def __call__(self, indices: Sequence[int]) -> np.ndarray:
        if self.capture is not None:
            try:
                return self._read(indices)
            except Exception:
                LOGGER.error("An error occurred when trying to read the video with "
                             "path %s and indices %s.", self.path, indices)
        return np.zeros((len(indices), *_FALLBACK_SHAPE), dtype=np.uint8)

    def _read(self, indices: Sequence[int]) -> np.ndarray:
        cv2 = self._cv2
        frames = {}
        unique = sorted(set(int(i) for i in indices))
        position = int(self.capture.get(cv2.CAP_PROP_POS_FRAMES))
        for index in unique:
            # Sequential grabs when close; seek for far jumps.
            if index < position or index - position > 64:
                self.capture.set(cv2.CAP_PROP_POS_FRAMES, index)
                position = index
            while position <= index:
                grabbed = self.capture.grab()
                if not grabbed:
                    break
                position += 1
            ok, frame = self.capture.retrieve()
            if not ok or frame is None:
                raise IOError(f"failed to decode frame {index}")
            # Same engage policy as the native reader (>=2x the target short
            # side), so a run produces identical geometry whichever backend
            # decodes.
            if self.short_side and min(frame.shape[:2]) >= 2 * self.short_side:
                new_h, new_w = scaled_size(frame.shape[0], frame.shape[1],
                                           self.short_side)
                frame = cv2.resize(frame, (new_w, new_h),
                                   interpolation=cv2.INTER_CUBIC)
            frames[index] = frame[:, :, ::-1]  # BGR -> RGB
        return np.stack([frames[int(i)] for i in indices]).astype(np.uint8)

    def __len__(self) -> int:
        if self.capture is None:
            return 1
        return int(self.capture.get(self._cv2.CAP_PROP_FRAME_COUNT))

    def time_to_indices(self, time) -> np.ndarray:
        if self.capture is None:
            return np.zeros_like(np.asarray(time), dtype=int)
        fps = self.get_avg_fps()
        times = (np.arange(len(self)) + 0.5) / fps
        return _nearest_indices(times, time)

    def get_avg_fps(self) -> float:
        if self.capture is None:
            return 1.0
        fps = self.capture.get(self._cv2.CAP_PROP_FPS)
        return float(fps) if fps and fps > 0 else 1.0

    def __del__(self):
        if getattr(self, "capture", None) is not None:
            self.capture.release()


class ImageVideoReader(VideoReader):
    """A still image as a 1-frame video (reference AccImageVideoReader
    semantics, video_reader.py:91-117)."""

    def __call__(self, indices: Sequence[int]) -> np.ndarray:
        import cv2

        try:
            image = cv2.imread(self.path, cv2.IMREAD_COLOR)
            if image is None:
                raise IOError(f"cannot read image {self.path}")
            return image[None, :, :, ::-1].astype(np.uint8)
        except Exception:
            LOGGER.error("An error occurred when trying to read the image with "
                         "path %s.", self.path)
            return np.zeros((len(indices), *_FALLBACK_SHAPE), dtype=np.uint8)

    def __len__(self) -> int:
        return 1

    def time_to_indices(self, time) -> np.ndarray:
        return np.zeros_like(np.asarray(time), dtype=int)

    def get_avg_fps(self) -> float:
        return 1.0
