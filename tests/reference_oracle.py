"""Helper to import the READ-ONLY reference implementation as a numeric test
oracle. The reference depends on the `overrides` package (absent here), which
is shimmed with a no-op decorator. Tests using this must skip gracefully when
the reference tree is unavailable.
"""

import importlib.machinery
import os
import sys
import types


def _stub_module(name: str) -> types.ModuleType:
    module = types.ModuleType(name)
    # transformers probes optional deps via importlib.util.find_spec, which
    # chokes on __spec__ = None.
    module.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return module

REFERENCE_PATH = "/root/reference"


def reference_available() -> bool:
    return os.path.isdir(os.path.join(REFERENCE_PATH, "aligner"))


def install_reference():
    if "overrides" not in sys.modules:
        shim = _stub_module("overrides")

        def overrides(*args, **kwargs):
            if args and callable(args[0]):
                return args[0]
            return lambda f: f

        shim.overrides = overrides
        sys.modules["overrides"] = shim

    if "cached_path" not in sys.modules:
        cp = _stub_module("cached_path")
        cp.cached_path = lambda path, *a, **k: path
        cp.CACHE_DIR = "/tmp"
        cp._find_latest_cached = lambda *a, **k: None
        sys.modules["cached_path"] = cp

    try:
        import torchvision  # noqa: F401
    except ImportError:
        tv = _stub_module("torchvision")
        transforms = _stub_module("torchvision.transforms")
        functional = _stub_module("torchvision.transforms.functional")
        datasets = _stub_module("torchvision.datasets")
        folder = _stub_module("torchvision.datasets.folder")
        video_utils = _stub_module("torchvision.datasets.video_utils")

        class _Unavailable:
            def __init__(self, *a, **k):
                raise RuntimeError("torchvision stub: not available in tests")

        for name in ("Compose", "Normalize", "Resize", "CenterCrop",
                     "RandomHorizontalFlip", "ConvertImageDtype",
                     "RandomResizedCrop", "InterpolationMode"):
            setattr(transforms, name, _Unavailable)
        transforms.InterpolationMode = types.SimpleNamespace(
            BICUBIC="bicubic", BILINEAR="bilinear")
        folder.IMG_EXTENSIONS = (".jpg", ".png")
        folder.is_image_file = lambda p: str(p).lower().endswith((".jpg", ".png"))

        class _VideoClips:
            @staticmethod
            def _resample_video_idx(num_frames, original_fps, new_fps):
                import torch

                step = original_fps / new_fps
                if step.is_integer():
                    return slice(None, None, int(step))
                idxs = torch.arange(num_frames, dtype=torch.float32) * step
                return idxs.floor().to(torch.int64)

        video_utils.VideoClips = _VideoClips
        datasets.folder = folder
        datasets.video_utils = video_utils
        tv.transforms = transforms
        tv.datasets = datasets
        tv.set_image_backend = lambda *a: None
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = transforms
        sys.modules["torchvision.transforms.functional"] = functional
        sys.modules["torchvision.datasets"] = datasets
        sys.modules["torchvision.datasets.folder"] = folder
        sys.modules["torchvision.datasets.video_utils"] = video_utils

    if "ftfy" not in sys.modules:
        try:
            import ftfy  # noqa: F401
        except ImportError:
            ftfy = _stub_module("ftfy")
            ftfy.fix_text = lambda text: text
            sys.modules["ftfy"] = ftfy

    if "pytorch_lightning" not in sys.modules:
        try:
            import pytorch_lightning  # noqa: F401
        except ImportError:
            pl = _stub_module("pytorch_lightning")
            utilities = _stub_module("pytorch_lightning.utilities")
            apply_func = _stub_module("pytorch_lightning.utilities.apply_func")

            class _LightningModule:
                pass

            def apply_to_collection(data, dtype, function, *args, **kwargs):
                if isinstance(data, dtype):
                    return function(data, *args, **kwargs)
                if isinstance(data, dict):
                    return {k: apply_to_collection(v, dtype, function, *args, **kwargs)
                            for k, v in data.items()}
                if isinstance(data, (list, tuple)):
                    return type(data)(apply_to_collection(v, dtype, function, *args, **kwargs)
                                      for v in data)
                return data

            pl.LightningModule = _LightningModule
            pl.LightningDataModule = _LightningModule
            apply_func.apply_to_collection = apply_to_collection
            utilities.apply_func = apply_func
            pl.utilities = utilities
            sys.modules["pytorch_lightning"] = pl
            sys.modules["pytorch_lightning.utilities"] = utilities
            sys.modules["pytorch_lightning.utilities.apply_func"] = apply_func

    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
