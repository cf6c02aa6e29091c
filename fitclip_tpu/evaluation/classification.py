"""Zero-shot video classification evaluation.

Reference semantics (aligner/video_text_classification.py:40-132): format every
label into every template, tokenize once; encode the label bank on device in
batches of 32; reshape to (n_labels, n_templates, D) and mean over templates;
score videos against the bank; report top-1/top-5 accuracy + MedianRank and
optionally per-class top-1.
"""

import dataclasses
from typing import Dict, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from fitclip_tpu.models.api import VideoTextEncoder
from fitclip_tpu.ops.metrics import accuracy_at_k, median_rank, ranks_from_scores

PRECISION = jax.lax.Precision.HIGHEST


def tokenize_label_bank(encoder: VideoTextEncoder, labels: Sequence[str],
                        templates: Optional[Sequence[str]] = None) -> np.ndarray:
    """(n_labels * n_templates, L) token ids, labels-major (label i occupies
    rows [i*T, (i+1)*T))."""
    templates = list(templates) if templates else ["{}"]
    texts = [template.format(label) for label in labels for template in templates]
    return encoder.get_tokenizer()(texts)


def encode_label_bank(encoder: VideoTextEncoder, params, tokenized: np.ndarray,
                      num_labels: int, encode_batch_size: int = 32) -> jnp.ndarray:
    """Encode the (padded) template bank in fixed-size batches and mean-pool
    per label -> (n_labels, D)."""
    total = tokenized.shape[0]
    padded_total = -(-total // encode_batch_size) * encode_batch_size
    padded = np.zeros((padded_total, tokenized.shape[1]), tokenized.dtype)
    padded[:total] = tokenized

    encode = jax.jit(lambda p, ids: encoder.encode_text(p, ids))
    chunks = [encode(params, jnp.asarray(padded[i: i + encode_batch_size]))
              for i in range(0, padded_total, encode_batch_size)]
    embeddings = jnp.concatenate(chunks)[:total]
    n_templates = total // num_labels
    return embeddings.reshape(num_labels, n_templates, -1).mean(axis=1)


@dataclasses.dataclass
class ClassificationEvaluator:
    """Accumulates (video_embedding, label) batches and computes accuracy
    against a fixed label bank."""
    label_bank: jnp.ndarray  # (n_labels, D)
    per_class: bool = False

    def __post_init__(self):
        self._scores: List[np.ndarray] = []
        self._labels: List[np.ndarray] = []

    def update(self, video_emb, labels, valid: Optional[int] = None) -> None:
        video_emb = jnp.asarray(np.asarray(video_emb, np.float32))
        scores = jnp.matmul(video_emb, self.label_bank.astype(jnp.float32).T,
                            precision=PRECISION)
        scores = np.asarray(scores)
        labels = np.asarray(labels)
        if valid is not None:
            scores, labels = scores[:valid], labels[:valid]
        self._scores.append(scores)
        self._labels.append(labels)

    def compute(self) -> Dict[str, float]:
        scores = jnp.asarray(np.concatenate(self._scores))
        labels = jnp.asarray(np.concatenate(self._labels).astype(np.int32))
        ranks = ranks_from_scores(scores, labels)
        metrics = {
            "a1": float(accuracy_at_k(ranks, 1)),
            "a5": float(accuracy_at_k(ranks, 5)),
            "mr": float(median_rank(ranks)),
        }
        if self.per_class:
            ranks_np = np.asarray(ranks)
            labels_np = np.asarray(labels)
            for label in np.unique(labels_np):
                mask = labels_np == label
                metrics[f"a1_class_{int(label)}"] = float((ranks_np[mask] < 1).mean())
        return metrics
