"""Retrieval/classification metrics as on-device JAX reductions.

The reference accumulates torchmetrics objects (``aligner/metrics.py:6-36``,
``aligner/text_video_retrieval.py:21-24``). Here metric state is plain arrays
carried through the jitted eval step; the final reductions are pure functions
over the accumulated rank vector, so they compose with `pjit`/`shard_map`
without a separate distributed-metrics subsystem.
"""

import jax.numpy as jnp


def ranks_from_scores(scores: jnp.ndarray, target: jnp.ndarray) -> jnp.ndarray:
    """0-based rank of each row's target column when scores are sorted descending.

    Mirrors the reference ``Rank.update`` (argsort descending, find target
    position — ``aligner/metrics.py:17-20``). Implemented as a comparison
    count instead of an argsort: rank(i) = #{j : s[i,j] > s[i,target_i]}
    (+ tie-break on earlier index for exact argsort parity), which is O(N)
    per row, vectorizes on the VPU, and needs no gather.
    """
    target = target.astype(jnp.int32)
    target_scores = jnp.take_along_axis(scores, target[:, None], axis=1)
    greater = (scores > target_scores).sum(axis=1)
    # torch.argsort(descending=True) places equal scores in index order, so a
    # tie at an earlier column outranks the target.
    col = jnp.arange(scores.shape[1], dtype=jnp.int32)[None, :]
    ties_before = ((scores == target_scores) & (col < target[:, None])).sum(axis=1)
    return (greater + ties_before).astype(jnp.int32)


def recall_at_k(ranks: jnp.ndarray, k: int) -> jnp.ndarray:
    """Fraction of queries whose 0-based rank is < k (R@K)."""
    return (ranks < k).mean()


def median_rank(ranks: jnp.ndarray) -> jnp.ndarray:
    """Median of ranks, 1-based (reference ``MedianRank`` adds 1, metrics.py:34-36).

    torch.median returns the lower of the two middle elements for even-length
    inputs; reproduce that rather than jnp.median's midpoint average.
    """
    sorted_ranks = jnp.sort(ranks)
    lower_middle = (ranks.shape[0] - 1) // 2
    return sorted_ranks[lower_middle] + 1


def mean_rank(ranks: jnp.ndarray) -> jnp.ndarray:
    """Mean of ranks, 1-based (reference ``MeanRank``, metrics.py:28-31)."""
    return ranks.astype(jnp.float32).mean() + 1


def accuracy_at_k(ranks: jnp.ndarray, k: int) -> jnp.ndarray:
    """Top-k accuracy for classification eval (same reduction as R@K)."""
    return recall_at_k(ranks, k)
