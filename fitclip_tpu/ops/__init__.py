from fitclip_tpu.ops.losses import nce_loss, similarity_loss, teacher_student_nce_loss
from fitclip_tpu.ops.metrics import ranks_from_scores, recall_at_k, median_rank, mean_rank

__all__ = [
    "nce_loss",
    "similarity_loss",
    "teacher_student_nce_loss",
    "ranks_from_scores",
    "recall_at_k",
    "median_rank",
    "mean_rank",
]
