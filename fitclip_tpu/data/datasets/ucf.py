"""UCF101 zero-shot classification: official split files, CamelCase folder
names to space-separated categories, 48 CLIP prompt templates
(aligner/data/ucf.py:22-130; templates from OpenAI CLIP prompts.md)."""

import os
import re
from typing import Mapping, Optional, Sequence, Tuple

from fitclip_tpu.data.data_module import VideoClassificationDataModule
from fitclip_tpu.data.video_dataset import VideoDataset

RE_CAPITALIZED_WORDS = re.compile(r"[a-zA-Z][^A-Z]*")

UCF_101_TEMPLATES = [
    "a photo of a person {}.",
    "a video of a person {}.",
    "a example of a person {}.",
    "a demonstration of a person {}.",
    "a photo of the person {}.",
    "a video of the person {}.",
    "a example of the person {}.",
    "a demonstration of the person {}.",
    "a photo of a person using {}.",
    "a video of a person using {}.",
    "a example of a person using {}.",
    "a demonstration of a person using {}.",
    "a photo of the person using {}.",
    "a video of the person using {}.",
    "a example of the person using {}.",
    "a demonstration of the person using {}.",
    "a photo of a person doing {}.",
    "a video of a person doing {}.",
    "a example of a person doing {}.",
    "a demonstration of a person doing {}.",
    "a photo of the person doing {}.",
    "a video of the person doing {}.",
    "a example of the person doing {}.",
    "a demonstration of the person doing {}.",
    "a photo of a person during {}.",
    "a video of a person during {}.",
    "a example of a person during {}.",
    "a demonstration of a person during {}.",
    "a photo of the person during {}.",
    "a video of the person during {}.",
    "a example of the person during {}.",
    "a demonstration of the person during {}.",
    "a photo of a person performing {}.",
    "a video of a person performing {}.",
    "a example of a person performing {}.",
    "a demonstration of a person performing {}.",
    "a photo of the person performing {}.",
    "a video of the person performing {}.",
    "a example of the person performing {}.",
    "a demonstration of the person performing {}.",
    "a photo of a person practicing {}.",
    "a video of a person practicing {}.",
    "a example of a person practicing {}.",
    "a demonstration of a person practicing {}.",
    "a photo of the person practicing {}.",
    "a video of the person practicing {}.",
    "a example of the person practicing {}.",
    "a demonstration of the person practicing {}.",
]


def folder_name_to_category(folder_name: str) -> str:
    return " ".join(RE_CAPITALIZED_WORDS.findall(folder_name))


class Ucf(VideoDataset):
    def __init__(self, categories: Mapping[str, int], file_list_path, videos_folder,
                 **kwargs) -> None:
        self.categories = categories
        with open(file_list_path) as file:
            relative_paths = [line.strip().split()[0] for line in file if line.strip()]
        super().__init__(video_paths=[os.path.join(videos_folder, p)
                                      for p in relative_paths], **kwargs)

    def _get_video_id(self, video_idx: int) -> str:
        folder_path, filename = os.path.split(self.video_paths[video_idx])
        return os.path.join(os.path.basename(folder_path), filename)

    def _get_target(self, video_idx: int) -> Tuple[str, int]:
        category = folder_name_to_category(os.path.dirname(self._get_video_id(video_idx)))
        return category, self.categories[category]


class UcfDataModule(VideoClassificationDataModule):
    def __init__(self, categories_file_path, val_file_list_path, val_videos_folder,
                 **kwargs) -> None:
        super().__init__(**kwargs)
        self.val_file_list_path = val_file_list_path
        self.val_videos_folder = val_videos_folder
        self._categories = {}
        with open(categories_file_path) as file:
            for line in file:
                if line.strip():
                    id_, folder_name = line.strip().split()
                    self._categories[folder_name_to_category(folder_name)] = int(id_) - 1

    @property
    def categories(self) -> Mapping[str, int]:
        return self._categories

    @property
    def templates(self) -> Optional[Sequence[str]]:
        return UCF_101_TEMPLATES

    def val_dataloader(self):
        dataset = Ucf(categories=self.categories, file_list_path=self.val_file_list_path,
                      videos_folder=self.val_videos_folder,
                      **self._dataset_kwargs(train=False))
        return self._create_dataloader(dataset, train=False)
