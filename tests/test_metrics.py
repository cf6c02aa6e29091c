"""Metric parity: ranks/R@K/median-rank vs torch argsort-based oracle."""

import jax.numpy as jnp
import numpy as np
import pytest
import torch

from fitclip_tpu.ops import median_rank, mean_rank, ranks_from_scores, recall_at_k


def _torch_ranks(scores: torch.Tensor, target: torch.Tensor) -> torch.Tensor:
    # The reference Rank.update semantics (aligner/metrics.py:17-20).
    sorted_positions = scores.argsort(dim=1, descending=True, stable=True)
    return torch.where(sorted_positions == target.unsqueeze(-1))[1]


@pytest.mark.parametrize("shape", [(1, 1), (5, 5), (16, 100), (100, 16)])
def test_ranks_match_torch(shape):
    rng = np.random.default_rng(0)
    scores = rng.normal(size=shape).astype(np.float32)
    target = rng.integers(0, shape[1], size=shape[0])
    expected = _torch_ranks(torch.from_numpy(scores), torch.from_numpy(target)).numpy()
    actual = np.asarray(ranks_from_scores(jnp.asarray(scores), jnp.asarray(target)))
    np.testing.assert_array_equal(actual, expected)


def test_ranks_with_ties_match_stable_argsort():
    scores = np.array([[1.0, 1.0, 1.0, 0.5],
                       [0.5, 1.0, 1.0, 1.0]], dtype=np.float32)
    target = np.array([2, 2])
    expected = _torch_ranks(torch.from_numpy(scores), torch.from_numpy(target)).numpy()
    actual = np.asarray(ranks_from_scores(jnp.asarray(scores), jnp.asarray(target)))
    np.testing.assert_array_equal(actual, expected)


def test_recall_at_k():
    ranks = jnp.asarray([0, 1, 4, 9, 10])
    assert float(recall_at_k(ranks, 1)) == pytest.approx(1 / 5)
    assert float(recall_at_k(ranks, 5)) == pytest.approx(3 / 5)
    assert float(recall_at_k(ranks, 10)) == pytest.approx(4 / 5)


@pytest.mark.parametrize("n", [1, 2, 5, 8, 101])
def test_median_rank_matches_torch(n):
    rng = np.random.default_rng(4)
    ranks = rng.integers(0, 50, size=n)
    expected = (torch.from_numpy(ranks).median() + 1).item()
    assert int(median_rank(jnp.asarray(ranks))) == expected


def test_mean_rank():
    ranks = jnp.asarray([0, 1, 2, 3])
    assert float(mean_rank(ranks)) == pytest.approx(2.5)


def test_retrieval_identity_scores_give_perfect_recall():
    n = 32
    scores = jnp.eye(n) + 0.01 * jnp.asarray(np.random.default_rng(5).normal(size=(n, n)))
    ranks = ranks_from_scores(scores, jnp.arange(n))
    assert float(recall_at_k(ranks, 1)) == 1.0
    assert int(median_rank(ranks)) == 1
