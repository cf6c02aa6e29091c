"""Numeric parity of JAX losses against torch oracle formulas.

torch (CPU) is used only as a test oracle: the expected values are recomputed
here from the loss definitions (symmetric InfoNCE, symmetric KL, sigmoid
similarity) so the JAX implementations can be checked to float tolerance.
"""

import jax.numpy as jnp
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from fitclip_tpu.ops import nce_loss, similarity_loss, teacher_student_nce_loss


def _torch_nce(scores: torch.Tensor, reduction: str = "mean") -> torch.Tensor:
    def one_way(s):
        loss = -F.log_softmax(s, dim=-1).diag()
        return loss.mean() if reduction == "mean" else loss.sum() if reduction == "sum" else loss
    return one_way(scores) + one_way(scores.T)


def _torch_ts(scores, teacher_scores, reduction="batchmean"):
    def one_way(s, t):
        return F.kl_div(F.log_softmax(s, dim=-1), F.softmax(t, dim=-1), reduction=reduction)
    return one_way(scores, teacher_scores) + one_way(scores.T, teacher_scores.T)


@pytest.mark.parametrize("n", [1, 4, 16, 33])
@pytest.mark.parametrize("reduction", ["mean", "sum"])
def test_nce_loss_matches_torch(n, reduction):
    rng = np.random.default_rng(0)
    scores = rng.normal(size=(n, n)).astype(np.float32) * 5
    expected = _torch_nce(torch.from_numpy(scores), reduction).item()
    actual = float(nce_loss(jnp.asarray(scores), reduction=reduction))
    assert actual == pytest.approx(expected, rel=1e-5, abs=1e-5)


def test_nce_loss_none_reduction_shape():
    scores = jnp.eye(8) * 3
    out = nce_loss(scores, reduction="none")
    assert out.shape == (8,)


@pytest.mark.parametrize("n", [2, 8, 31])
@pytest.mark.parametrize("reduction", ["batchmean", "mean", "sum"])
def test_teacher_student_loss_matches_torch(n, reduction):
    rng = np.random.default_rng(1)
    s = rng.normal(size=(n, n)).astype(np.float32) * 3
    t = rng.normal(size=(n, n)).astype(np.float32) * 3
    expected = _torch_ts(torch.from_numpy(s), torch.from_numpy(t), reduction).item()
    actual = float(teacher_student_nce_loss(jnp.asarray(s), jnp.asarray(t), reduction=reduction))
    assert actual == pytest.approx(expected, rel=1e-4, abs=1e-5)


def test_teacher_student_loss_zero_when_equal():
    rng = np.random.default_rng(2)
    s = rng.normal(size=(8, 8)).astype(np.float32)
    assert float(teacher_student_nce_loss(jnp.asarray(s), jnp.asarray(s), "batchmean")) == pytest.approx(0.0, abs=1e-4)


@pytest.mark.parametrize("n", [1, 7, 16])
def test_similarity_loss_matches_torch(n):
    rng = np.random.default_rng(3)
    scores = rng.normal(size=(n, n)).astype(np.float32)
    expected = (-torch.log(torch.sigmoid(torch.from_numpy(scores).diag()))).mean().item()
    actual = float(similarity_loss(jnp.asarray(scores)))
    assert actual == pytest.approx(expected, rel=1e-4)


def test_nce_loss_is_differentiable():
    import jax
    scores = jnp.eye(4) * 2.0
    grad = jax.grad(lambda s: nce_loss(s))(scores)
    assert np.isfinite(np.asarray(grad)).all()
    # Diagonal gradient must be negative (increasing correct-pair score lowers loss).
    assert (np.diagonal(np.asarray(grad)) < 0).all()
