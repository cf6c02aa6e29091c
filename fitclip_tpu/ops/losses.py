"""Contrastive and distillation losses as pure JAX functions.

Semantics match the reference implementation (``aligner/loss.py:13-65`` in
bryant1410/fitclip): a symmetric InfoNCE over a square similarity matrix, a
symmetric KL teacher-student distillation loss, and a sigmoid similarity loss.
Unlike the reference (torch ``nn.Module`` subclasses), these are pure functions
designed to be called inside a single jitted SPMD step; on a sharded score
matrix the row-direction term only needs the local rows, so callers can keep
``scores`` row-sharded over the data mesh axis.
"""

from typing import Literal

import jax
import jax.numpy as jnp

Reduction = Literal["none", "mean", "sum"]
KLReduction = Literal["none", "batchmean", "mean", "sum"]


def _reduce(loss: jnp.ndarray, reduction: Reduction) -> jnp.ndarray:
    if reduction == "mean":
        return loss.mean()
    if reduction == "sum":
        return loss.sum()
    return loss


def _rows_to_columns_nce(scores: jnp.ndarray, reduction: Reduction) -> jnp.ndarray:
    # -log p(column i | row i): diagonal of the row-wise log-softmax.
    log_probs = jax.nn.log_softmax(scores, axis=-1)
    loss = -jnp.diagonal(log_probs)
    return _reduce(loss, reduction)


def nce_loss(scores: jnp.ndarray, reduction: Reduction = "mean") -> jnp.ndarray:
    """Symmetric InfoNCE on a square score matrix (video rows x text columns).

    Equals ``rows_to_columns(scores) + rows_to_columns(scores.T)`` with each
    direction reduced independently (reference ``aligner/loss.py:24-26``).
    """
    return (_rows_to_columns_nce(scores, reduction)
            + _rows_to_columns_nce(scores.T, reduction))


def _kl_div(student_log_probs: jnp.ndarray, teacher_probs: jnp.ndarray,
            reduction: KLReduction) -> jnp.ndarray:
    # KL(teacher || student) evaluated pointwise, with torch.nn.functional.kl_div
    # conventions: contributions are t * (log t - s); entries with t == 0
    # contribute exactly 0.
    safe_log_t = jnp.where(teacher_probs > 0, jnp.log(jnp.where(teacher_probs > 0, teacher_probs, 1.0)), 0.0)
    pointwise = jnp.where(teacher_probs > 0,
                          teacher_probs * (safe_log_t - student_log_probs),
                          0.0)
    if reduction == "batchmean":
        return pointwise.sum() / pointwise.shape[0]
    if reduction == "mean":
        return pointwise.mean()
    if reduction == "sum":
        return pointwise.sum()
    return pointwise


def _rows_to_columns_ts_nce(scores: jnp.ndarray, teacher_scores: jnp.ndarray,
                            reduction: KLReduction) -> jnp.ndarray:
    student_log_probs = jax.nn.log_softmax(scores, axis=-1)
    teacher_probs = jax.nn.softmax(teacher_scores, axis=-1)
    return _kl_div(student_log_probs, teacher_probs, reduction)


def teacher_student_nce_loss(scores: jnp.ndarray, teacher_scores: jnp.ndarray,
                             reduction: KLReduction = "mean") -> jnp.ndarray:
    """Symmetric KL(student || teacher) distillation loss.

    Matches the reference ``teacher_student_nce_loss`` (``aligner/loss.py:36-39``):
    row-direction KL plus column-direction KL, each on softmaxed scores. The
    FitCLIP trainer uses reduction="batchmean" (``aligner/teacher_student.py:73``).
    """
    return (_rows_to_columns_ts_nce(scores, teacher_scores, reduction)
            + _rows_to_columns_ts_nce(scores.T, teacher_scores.T, reduction))


def similarity_loss(scores: jnp.ndarray, reduction: Reduction = "mean") -> jnp.ndarray:
    """-log(sigmoid(diag(scores))) — BCE-style alternative (``aligner/loss.py:54-65``)."""
    loss = -jax.nn.log_sigmoid(jnp.diagonal(scores))
    return _reduce(loss, reduction)
