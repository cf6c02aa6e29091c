"""YouCook2 retrieval (MIL-NCE validation CSV with clip start/end times;
aligner/data/youcook2.py:20-51). Clip times seek through the reader's
time_to_indices."""

import glob
import os
from typing import Optional, Tuple

from fitclip_tpu.data.data_module import VideoTextDataModule
from fitclip_tpu.data.video_dataset import VideoDataset


class YouCook2(VideoDataset):
    def __init__(self, video_info_file_path, videos_folder, **kwargs) -> None:
        import pandas as pd

        self.video_info = pd.read_csv(video_info_file_path, dtype={"task": str})
        video_paths = []
        for _, row in self.video_info.iterrows():
            matches = glob.glob(os.path.join(videos_folder, row.task, f"{row.video_id}.*"))
            if not matches:
                raise FileNotFoundError(
                    f"No video for task={row.task} id={row.video_id} under {videos_folder}")
            video_paths.append(matches[0])
        super().__init__(video_paths=video_paths, **kwargs)

    def _get_target(self, video_idx: int) -> str:
        return self.video_info.loc[video_idx, "text"]

    def _get_times(self, video_idx: int) -> Tuple[Optional[float], Optional[float]]:
        row = self.video_info.loc[video_idx]
        return float(row.start), float(row.end)


class YouCook2DataModule(VideoTextDataModule):
    def __init__(self, val_video_info_file_path, val_videos_folder, **kwargs) -> None:
        super().__init__(**kwargs)
        self.val_video_info_file_path = val_video_info_file_path
        self.val_videos_folder = val_videos_folder

    def val_dataloader(self):
        dataset = YouCook2(video_info_file_path=self.val_video_info_file_path,
                           videos_folder=self.val_videos_folder,
                           **self._dataset_kwargs(train=False))
        return self._create_dataloader(dataset, train=False)
