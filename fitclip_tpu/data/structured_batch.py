"""Merging batches from a structured group of datasets into one batch.

Reference: util/structured_group_utils.py:15-41 (`_cat_collate` +
`_merge_datasets_batch`) — consumers of DataModuleStructuredGroup concatenate
the per-dataset batches, right-padding token arrays to the longest so the
merged batch is rectangular, and keep the per-dataset lengths for splitting
losses/metrics back out.
"""

from typing import Dict, List, Mapping, Sequence, Tuple

import numpy as np

from fitclip_tpu.utils.tensor import pad_axis_to


def cat_collate(batches: Sequence[Mapping[str, object]]) -> Dict[str, object]:
    """Concatenate same-keyed batches; text-like 2D int arrays pad to the
    longest sequence length first; lists extend."""
    merged: Dict[str, object] = {}
    for key in batches[0]:
        values = [batch[key] for batch in batches]
        if isinstance(values[0], np.ndarray):
            if values[0].ndim >= 2:
                common = max(v.shape[1] for v in values)
                values = [pad_axis_to(v, common, axis=1) for v in values]
            merged[key] = np.concatenate(values)
        elif isinstance(values[0], list):
            merged[key] = [item for value in values for item in value]
        else:
            merged[key] = values
    return merged


def merge_datasets_batch(batches_by_dataset: Mapping[str, Mapping[str, object]]
                         ) -> Tuple[Dict[str, object], List[int]]:
    """{"msrvtt": batch, "webvid": batch} -> (merged batch, per-dataset sizes)."""
    names = list(batches_by_dataset)
    batches = [batches_by_dataset[name] for name in names]
    lengths = []
    for batch in batches:
        first_array = next(v for v in batch.values() if isinstance(v, np.ndarray))
        lengths.append(first_array.shape[0])
    return cat_collate(batches), lengths
