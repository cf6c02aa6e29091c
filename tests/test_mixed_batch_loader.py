"""MixedBatchLoader determinism and cycling semantics.

Reference behavior being matched: the teacher-student train loader composes
per-source torch RandomSamplers with max_size_cycle cycling
(aligner/data/data_module_group.py:129-137 + multi_source_sampler.py:25-29) —
a cycled source re-iterates its RandomSampler each cycle and therefore draws
a FRESH permutation per cycle. The stream must also be identical across
processes (PYTHONHASHSEED must not leak into the order).
"""

import json
import os
import subprocess
import sys

from fitclip_tpu.data.data_module_group import MixedBatchLoader


class _Dataset:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __getitem__(self, i, rng=None):
        return {"index": i}


class _Loader:
    def __init__(self, n):
        self.dataset = _Dataset(n)
        self.epoch = 0

    def set_epoch(self, epoch):
        self.epoch = epoch

    def collate(self, items):
        return {"index": [it["index"] for it in items]}


def _make(seed=7):
    return MixedBatchLoader({"labeled": _Loader(40), "unlabeled": _Loader(6)},
                            {"labeled": 2, "unlabeled": 2}, seed=seed,
                            num_threads=2)


def test_plan_is_deterministic_and_reshuffles_per_cycle():
    loader = _make()
    plan = loader._index_plan()
    assert plan == _make()._index_plan()
    assert len(plan) == len(loader) == 20

    # The longest source consumes one epoch permutation without repeats.
    labeled = [i for spec in plan for i in spec["labeled"]]
    assert sorted(labeled) == list(range(40))

    # The cycled source (6 items, consumed 2/batch -> a cycle every 3
    # batches) must be a permutation within each cycle AND not repeat one
    # fixed order across cycles.
    unlabeled = [i for spec in plan for i in spec["unlabeled"]]
    cycles = [unlabeled[c: c + 6] for c in range(0, len(unlabeled) - 5, 6)]
    assert all(sorted(c) == list(range(6)) for c in cycles)
    assert len({tuple(c) for c in cycles}) > 1, (
        "cycled source repeated one fixed permutation (reference draws a "
        "fresh RandomSampler permutation per cycle)")


def test_epoch_changes_plan():
    loader = _make()
    plan0 = loader._index_plan()
    loader.set_epoch(1)
    assert loader._index_plan() != plan0


def test_iter_matches_plan_through_prefetch_pool():
    loader = _make()
    plan = loader._index_plan()
    batches = list(loader)
    assert [{k: b[k]["index"] for k in b} for b in batches] == plan


def test_plan_independent_of_pythonhashseed():
    script = (
        "import json, sys\n"
        "sys.path.insert(0, %r)\n"
        "from tests.test_mixed_batch_loader import _make\n"
        "print(json.dumps(_make()._index_plan()))\n"
        % os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    plans = []
    for hashseed in ("0", "1"):
        env = dict(os.environ, PYTHONHASHSEED=hashseed, JAX_PLATFORMS="cpu")
        out = subprocess.run([sys.executable, "-c", script], env=env,
                             capture_output=True, text=True, check=True)
        plans.append(json.loads(out.stdout.strip().splitlines()[-1]))
    assert plans[0] == plans[1]
