"""fitclip_tpu: a TPU-native (JAX/XLA/Pallas/pjit) video-text alignment framework.

Re-designed from scratch with the capabilities of the FitCLIP reference
(BMVC 2022, "FitCLIP: Refining Large-Scale Pretrained Image-Text Models for
Zero-Shot Video Understanding Tasks"): a zoo of dual-encoder video/text models,
video benchmark datasets, contrastive + teacher-student distillation training,
retrieval / zero-shot classification evaluation, and WiSE-FT weight ensembling —
all built TPU-first: SPMD over `jax.sharding.Mesh`, one jitted train/eval step,
differentiable `lax.all_gather` for global-batch contrastive losses, and fused
on-device preprocessing.
"""

__version__ = "0.1.0"
