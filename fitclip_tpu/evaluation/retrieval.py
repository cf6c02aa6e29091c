"""Text->video retrieval evaluation.

Reference semantics (aligner/text_video_retrieval.py:67-98): accumulate
embeddings over batches; at epoch end compute the full ``texts @ videos^T``
matrix with target = arange(N); report R@1/5/10 + MedianRank (and optionally
the raw ranks / MeanRank).
"""

import dataclasses
from typing import Dict, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from fitclip_tpu.ops.metrics import mean_rank, median_rank, ranks_from_scores, recall_at_k

PRECISION = jax.lax.Precision.HIGHEST


@jax.jit
def _retrieval_ranks(texts: jnp.ndarray, videos: jnp.ndarray) -> jnp.ndarray:
    scores = jnp.matmul(texts, videos.T, precision=PRECISION)
    return ranks_from_scores(scores, jnp.arange(scores.shape[0]))


def retrieval_metrics(ranks: jnp.ndarray, include_mean_rank: bool = False) -> Dict[str, float]:
    metrics = {
        "r1": float(recall_at_k(ranks, 1)),
        "r5": float(recall_at_k(ranks, 5)),
        "r10": float(recall_at_k(ranks, 10)),
        "mr": float(median_rank(ranks)),
    }
    if include_mean_rank:
        metrics["mean_rank"] = float(mean_rank(ranks))
    return metrics


@dataclasses.dataclass
class RetrievalEvaluator:
    """Accumulates (video, text) embedding batches, then computes the full
    similarity matrix metrics. Embeddings are pulled to host as fp32 (tiny:
    N x 512) so the accumulator has no device-memory footprint."""
    include_mean_rank: bool = False

    def __post_init__(self):
        self._videos: List[np.ndarray] = []
        self._texts: List[np.ndarray] = []

    def update(self, video_emb, text_emb, valid: Optional[int] = None) -> None:
        # Keep device arrays as-is: converting here would synchronize every
        # batch and stall the dispatch pipeline; compute() materializes once.
        if valid is not None:  # drop padding rows added for shard divisibility
            video_emb, text_emb = video_emb[:valid], text_emb[:valid]
        self._videos.append(video_emb)
        self._texts.append(text_emb)

    def compute(self) -> Dict[str, float]:
        videos = jnp.asarray(np.concatenate(
            [np.asarray(v, np.float32) for v in self._videos]))
        texts = jnp.asarray(np.concatenate(
            [np.asarray(t, np.float32) for t in self._texts]))
        ranks = _retrieval_ranks(texts, videos)
        return retrieval_metrics(ranks, self.include_mean_rank)

    def reset(self) -> None:
        self._videos.clear()
        self._texts.clear()
