"""Data-module combinators: eval groups, structured groups, mixed batches.

Reference semantics (aligner/data/data_module_group.py:61-208) with one
TPU-first change: the mixed labeled/unlabeled training batch is yielded as a
*structured* batch {"labeled": sub, "unlabeled": sub} instead of a flat
16-row batch with a per-row "dataset" key. The underlying sample stream is
identical (per-source random order, round-robin max_size_cycle composition,
drop_last), but the static split means the jitted teacher-student step sees
fixed shapes — no runtime groupby (teacher_student.py:100-102) required.
"""

from typing import Dict, Iterator, List, Mapping, Optional, Union

import numpy as np

from fitclip_tpu.data.loader import DataLoader, item_rng
from fitclip_tpu.data.multi_source_sampler import CycleSampler


class EvalDataModuleGroup:
    """Sequences the val/test/predict loaders of several data modules
    (data_module_group.py:61-72)."""

    def __init__(self, data_modules: Union[Mapping[str, object], List[object]]) -> None:
        if isinstance(data_modules, Mapping):
            self.names = list(data_modules.keys())
            self.data_modules = list(data_modules.values())
        else:
            self.names = [str(i) for i in range(len(data_modules))]
            self.data_modules = list(data_modules)

    def val_dataloader(self) -> List[DataLoader]:
        return [dm.val_dataloader() for dm in self.data_modules]

    def test_dataloader(self) -> List[DataLoader]:
        return [dm.test_dataloader() for dm in self.data_modules]

    def predict_dataloader(self) -> List[DataLoader]:
        return [dm.predict_dataloader() for dm in self.data_modules]


class DataModuleStructuredGroup(EvalDataModuleGroup):
    """Adds training: a mapping of each sub-module's train loader
    (data_module_group.py:75-78)."""

    def train_dataloader(self) -> Dict[str, DataLoader]:
        return {name: dm.train_dataloader()
                for name, dm in zip(self.names, self.data_modules)}


class MixedBatchLoader:
    """Fixed-composition mixed batches: each batch holds exactly
    sequence_sizes[k] items of source k (in per-source random order), sources
    cycling except the longest-running one (max_size_cycle), drop_last."""

    def __init__(self, loaders: Mapping[str, DataLoader],
                 sequence_sizes: Mapping[str, int], seed: int = 42) -> None:
        self.loaders = dict(loaders)
        self.sequence_sizes = {k: int(sequence_sizes[k]) for k in self.loaders}
        self.seed = seed
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        self.epoch = epoch
        for loader in self.loaders.values():
            loader.set_epoch(epoch)

    def __len__(self) -> int:
        # Number of full rounds the longest-running source supports.
        return max(len(loader.dataset) // size
                   for loader, size in zip(self.loaders.values(),
                                           self.sequence_sizes.values()))

    def _orders(self) -> Dict[str, Iterator[int]]:
        orders = {}
        runs = {name: len(loader.dataset) // self.sequence_sizes[name]
                for name, loader in self.loaders.items()}
        longest = max(runs, key=lambda name: runs[name])
        for name, loader in self.loaders.items():
            rng = np.random.default_rng(
                np.random.SeedSequence([self.seed, self.epoch, hash(name) % (2 ** 31)]))
            order = rng.permutation(len(loader.dataset)).tolist()
            orders[name] = iter(order) if name == longest else iter(CycleSampler(order))
        return orders

    def __iter__(self) -> Iterator[Dict[str, dict]]:
        orders = self._orders()
        num_batches = len(self)
        for _ in range(num_batches):
            batch: Dict[str, dict] = {}
            for name, loader in self.loaders.items():
                indices = [next(orders[name]) for _ in range(self.sequence_sizes[name])]
                items = [loader.dataset.__getitem__(
                    i, rng=item_rng(self.seed, self.epoch, i)) for i in indices]
                batch[name] = loader.collate(items)
            yield batch


class MixedBatchDataModule(EvalDataModuleGroup):
    """Training combines the sub-modules into mixed fixed-composition batches;
    evaluation runs each separately (data_module_group.py:105-169)."""

    def __init__(self, data_modules: Mapping[str, object],
                 train_sequence_sizes: Union[int, Mapping[str, int]] = 1,
                 seed: int = 42) -> None:
        super().__init__(data_modules)
        if isinstance(train_sequence_sizes, Mapping):
            self.train_sequence_sizes = {k: int(v) for k, v in train_sequence_sizes.items()}
        else:
            self.train_sequence_sizes = {name: int(train_sequence_sizes)
                                         for name in self.names}
        self.seed = seed

    def train_dataloader(self) -> MixedBatchLoader:
        loaders = {name: dm.train_dataloader()
                   for name, dm in zip(self.names, self.data_modules)}
        return MixedBatchLoader(loaders, self.train_sequence_sizes, seed=self.seed)


class TrainAndEvalDataModules:
    """Train on one module, evaluate on another (data_module_group.py:190-208)."""

    def __init__(self, train_data_module, eval_data_module) -> None:
        self.train_data_module = train_data_module
        self.eval_data_module = eval_data_module

    def train_dataloader(self):
        return self.train_data_module.train_dataloader()

    def val_dataloader(self):
        return self.eval_data_module.val_dataloader()

    def test_dataloader(self):
        return self.eval_data_module.test_dataloader()

    def predict_dataloader(self):
        return self.eval_data_module.predict_dataloader()
