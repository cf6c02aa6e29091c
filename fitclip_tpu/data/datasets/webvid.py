"""WebVid video-text dataset: results CSV (videoid -> caption "name") +
videos folder (aligner/data/webvid.py:23-75 layout)."""

import os

from fitclip_tpu.data.data_module import (VideoTextDataModule,
                                          get_sorted_videos_in_folder)
from fitclip_tpu.data.video_dataset import VideoDataset


class WebVid(VideoDataset):
    def __init__(self, video_info_file_path, videos_folder,
                 filter_videos_from_info_file: bool = False, **kwargs) -> None:
        import pandas as pd

        self.video_info = pd.read_csv(video_info_file_path, index_col="videoid",
                                      dtype={"videoid": str})
        if filter_videos_from_info_file:
            video_paths = [os.path.join(videos_folder, f"{video_id}.mp4")
                           for video_id in self.video_info.index]
        else:
            video_paths = get_sorted_videos_in_folder(videos_folder)
        super().__init__(video_paths=video_paths, **kwargs)

    def _get_target(self, video_idx: int) -> str:
        return self.video_info.loc[self._get_video_id(video_idx), "name"]


class WebVidDataModule(VideoTextDataModule):
    def __init__(self, train_video_info_file_path=None, train_videos_folder=None,
                 train_filter_videos_from_info_file: bool = False,
                 val_video_info_file_path=None, val_videos_folder=None,
                 val_filter_videos_from_info_file: bool = False, **kwargs) -> None:
        super().__init__(**kwargs)
        self.train_video_info_file_path = train_video_info_file_path
        self.train_videos_folder = train_videos_folder
        self.train_filter_videos_from_info_file = train_filter_videos_from_info_file
        self.val_video_info_file_path = val_video_info_file_path
        self.val_videos_folder = val_videos_folder
        self.val_filter_videos_from_info_file = val_filter_videos_from_info_file

    def _dataset(self, info_path, folder, filter_from_info: bool, train: bool):
        return WebVid(video_info_file_path=info_path, videos_folder=folder,
                      filter_videos_from_info_file=filter_from_info,
                      **self._dataset_kwargs(train=train))

    def train_dataloader(self):
        return self._create_dataloader(
            self._dataset(self.train_video_info_file_path, self.train_videos_folder,
                          self.train_filter_videos_from_info_file, train=True), train=True)

    def val_dataloader(self):
        return self._create_dataloader(
            self._dataset(self.val_video_info_file_path, self.val_videos_folder,
                          self.val_filter_videos_from_info_file, train=False), train=False)
