"""Data-module combinators: eval groups, structured groups, mixed batches.

Reference semantics (aligner/data/data_module_group.py:61-208) with one
TPU-first change: the mixed labeled/unlabeled training batch is yielded as a
*structured* batch {"labeled": sub, "unlabeled": sub} instead of a flat
16-row batch with a per-row "dataset" key. The underlying sample stream is
identical (per-source random order, round-robin max_size_cycle composition,
drop_last), but the static split means the jitted teacher-student step sees
fixed shapes — no runtime groupby (teacher_student.py:100-102) required.
"""

import zlib
from typing import Dict, Iterator, List, Mapping, Optional, Union

import numpy as np

from fitclip_tpu.data.loader import DataLoader, item_rng, prefetched_batches


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


def _stable_source_key(name: str) -> int:
    """Process-independent integer key for a source name. Python's built-in
    ``hash`` on strings is randomized per process (PYTHONHASHSEED), which
    would give two runs of the same command different data orders."""
    return zlib.crc32(name.encode("utf-8"))


class MixedBatchLoader:
    """Fixed-composition mixed batches: each batch holds exactly
    sequence_sizes[k] items of source k (in per-source random order), sources
    cycling except the longest-running one (max_size_cycle), drop_last.

    Matches the reference's sampler composition (aligner/data/
    multi_source_sampler.py:25-29 + data_module_group.py:129-137): a cycled
    source re-iterates a torch RandomSampler each cycle, i.e. draws a FRESH
    permutation per cycle — so shorter sources don't repeat one fixed order
    within an epoch. Item decode runs on a GIL-releasing thread pool with a
    bounded prefetch queue, same as ``DataLoader``."""

    def __init__(self, loaders: Mapping[str, DataLoader],
                 sequence_sizes: Mapping[str, int], seed: int = 42,
                 num_threads: int = 8, prefetch_batches: int = 2,
                 process_index: int = 0, process_count: int = 1) -> None:
        self.loaders = dict(loaders)
        self.sequence_sizes = {k: int(sequence_sizes[k]) for k in self.loaders}
        self.seed = seed
        self.epoch = 0
        self.num_threads = max(1, num_threads)
        self.prefetch_batches = prefetch_batches
        # Multi-host: sequence_sizes are GLOBAL per-batch runs; every process
        # derives the same global plan and decodes only its row block of each
        # source's run (see DataLoader for the single-source equivalent).
        self.process_index = process_index
        self.process_count = max(1, process_count)

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

        def cycling(n: int, rng: np.random.Generator) -> Iterator[int]:
            while True:
                yield from rng.permutation(n).tolist()

        for name, loader in self.loaders.items():
            rng = np.random.default_rng(np.random.SeedSequence(
                [self.seed, self.epoch, _stable_source_key(name)]))
            n = len(loader.dataset)
            orders[name] = (iter(rng.permutation(n).tolist())
                            if name == longest else cycling(n, rng))
        return orders

    def _iter_specs(self) -> Iterator[Dict[str, List[int]]]:
        """Lazily yields one batch's per-source index lists at a time — a
        WebVid-scale epoch plan never materializes in memory."""
        orders = self._orders()
        for _ in range(len(self)):
            spec = {name: [next(orders[name])
                           for _ in range(self.sequence_sizes[name])]
                    for name in self.loaders}
            if self.process_count > 1:
                for name, indices in spec.items():
                    if len(indices) % self.process_count:
                        raise ValueError(
                            f"source {name!r} run of {len(indices)} is not "
                            f"divisible by {self.process_count} processes — "
                            "make train_sequence_sizes multiples of the "
                            "process count")
                    per = len(indices) // self.process_count
                    spec[name] = indices[self.process_index * per:
                                         (self.process_index + 1) * per]
            yield spec

    def _index_plan(self) -> List[Dict[str, List[int]]]:
        return list(self._iter_specs())

    def __iter__(self) -> Iterator[Dict[str, dict]]:
        def load(name: str, index: int):
            return self.loaders[name].dataset.__getitem__(
                index, rng=item_rng(self.seed, self.epoch, index))

        def make_batch(pool, spec):
            pairs = [(name, i) for name, indices in spec.items()
                     for i in indices]
            items = list(pool.map(lambda p: load(*p), pairs))
            batch, cursor = {}, 0
            for name, indices in spec.items():
                sub = items[cursor:cursor + len(indices)]
                cursor += len(indices)
                batch[name] = self.loaders[name].collate(sub)
            return batch

        yield from prefetched_batches(self._iter_specs(), make_batch,
                                      self.num_threads, self.prefetch_batches)


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
        try:
            import jax

            process_index, process_count = jax.process_index(), jax.process_count()
        except Exception:
            process_index, process_count = 0, 1
        return MixedBatchLoader(loaders, self.train_sequence_sizes,
                                seed=self.seed, process_index=process_index,
                                process_count=process_count)


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
