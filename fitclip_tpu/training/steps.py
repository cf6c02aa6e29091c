"""Jitted SPMD train/eval steps.

One pure function per task module of the reference:
- contrastive step  <- VideoTextLightningModule (video_text_module.py:55-76)
- teacher-student   <- TeacherStudentLightningModule (teacher_student.py:99-183)
- eval step         <- validation paths (embeddings only)

All steps are written global-batch style: inputs arrive sharded on the leading
axis over the "data" mesh axis, parameters replicated; the score matrix
``exp(logit_scale) * V @ T^T`` contracts over the embedding dim, so XLA emits
the embedding all-gather over ICI automatically — the explicit
``all_gather(sync_grads=True)`` of the reference is implicit and
differentiable here.
"""

from functools import partial
from typing import Any, Callable, Mapping, Optional

import jax
import jax.numpy as jnp
import optax

from fitclip_tpu.models.api import VideoTextEncoder
from fitclip_tpu.ops.losses import nce_loss, teacher_student_nce_loss
from fitclip_tpu.training.state import TrainState, apply_updates_with_clamp

Batch = Mapping[str, Any]
PRECISION = jax.lax.Precision.HIGHEST


def _scores(video_emb, text_emb, logit_scale):
    return jnp.exp(logit_scale[0]) * jnp.matmul(
        video_emb.astype(jnp.float32), text_emb.astype(jnp.float32).T,
        precision=PRECISION)


def _encode_video_train(encoder, params, video):
    """Train-mode video encode. Encoders with normalization state (the
    batch-stats BN CLIP ResNets) return (emb, bn_updates); stateless encoders
    return (emb, None). The hasattr dispatch is static per encoder type, so
    the jitted step specializes with no runtime branch."""
    if hasattr(encoder, "encode_video_train"):
        return encoder.encode_video_train(params, video)
    return encoder.encode_video(params, video), None


def _apply_bn_updates(encoder, state: TrainState, bn_updates) -> TrainState:
    if bn_updates is None:
        return state
    new_params = dict(state.params)
    new_params["encoder"] = encoder.apply_bn_updates(new_params["encoder"],
                                                     bn_updates)
    return state.replace(params=new_params)


def make_contrastive_train_step(encoder: VideoTextEncoder,
                                optimizer: optax.GradientTransformation,
                                loss_fn: Callable = nce_loss):
    """(state, batch{video, text}) -> (state, metrics)."""

    def loss(params, batch):
        video_emb, bn_updates = _encode_video_train(encoder, params["encoder"],
                                                    batch["video"])
        text_emb = encoder.encode_text(params["encoder"], batch["text"])
        scores = _scores(video_emb, text_emb, params["logit_scale"])
        return loss_fn(scores), bn_updates

    def step(state: TrainState, batch: Batch):
        (loss_value, bn_updates), grads = jax.value_and_grad(loss, has_aux=True)(
            state.params, batch)
        new_state = apply_updates_with_clamp(state, grads, optimizer)
        new_state = _apply_bn_updates(encoder, new_state, bn_updates)
        metrics = {
            "loss/train": loss_value,
            "temperature": 1.0 / jnp.exp(new_state.params["logit_scale"][0]),
        }
        return new_state, metrics

    return step


def make_teacher_student_train_step(
        student: VideoTextEncoder,
        teacher: VideoTextEncoder,
        optimizer: optax.GradientTransformation,
        labeled_loss_share: float = 0.5,
        student_prompt_ids: Optional[jnp.ndarray] = None,
        teacher_prompt_ids: Optional[jnp.ndarray] = None):
    """The FitCLIP distillation step (teacher_student.py:99-183).

    Batch layout: {"labeled": sub, "unlabeled": sub} where each sub-batch has
    video_student/text_student/video_teacher/text_teacher — the reference's
    runtime groupby over a mixed batch becomes a static split because the
    round-robin sampler composition is fixed per batch (static shapes for XLA).
    If prompts are given they replace the unlabeled text side for BOTH towers
    (teacher_student.py:104-116): scores become (videos x prompt bank).

    The student runs ONCE over the concatenated labeled+unlabeled batch,
    exactly like the reference's single forward (teacher_student.py:95) — so
    BatchNorm students normalize with combined-batch statistics and do one
    EMA running-stat update, and the ViT students get one full-batch matmul
    instead of two half-batch ones.
    """
    unlabeled_loss_share = 1.0 - labeled_loss_share

    def loss(params, teacher_params, batch):
        logit_scale = params["logit_scale"]
        ts_logit_scale = params["ts_logit_scale"]

        labeled, unlabeled = batch["labeled"], batch["unlabeled"]
        student_text = (student_prompt_ids if student_prompt_ids is not None
                        else unlabeled["text_student"])
        teacher_text = (teacher_prompt_ids if teacher_prompt_ids is not None
                        else unlabeled["text_teacher"])

        n_video = labeled["video_student"].shape[0]
        n_text = labeled["text_student"].shape[0]
        all_video = jnp.concatenate([labeled["video_student"],
                                     unlabeled["video_student"]], axis=0)
        all_text = jnp.concatenate([labeled["text_student"],
                                    jnp.asarray(student_text)], axis=0)
        all_video_emb, bn_updates = _encode_video_train(
            student, params["encoder"], all_video)
        all_text_emb = student.encode_text(params["encoder"], all_text)
        video_emb, u_video = all_video_emb[:n_video], all_video_emb[n_video:]
        text_emb, u_text = all_text_emb[:n_text], all_text_emb[n_text:]
        labeled_loss = nce_loss(_scores(video_emb, text_emb, logit_scale))

        t_video = teacher.encode_video(teacher_params, unlabeled["video_teacher"])
        t_text = teacher.encode_text(teacher_params, teacher_text)
        t_video = jax.lax.stop_gradient(t_video)
        t_text = jax.lax.stop_gradient(t_text)

        student_scores = _scores(u_video, u_text, logit_scale)
        ts_scale = jnp.exp(ts_logit_scale[0])
        teacher_scores = ts_scale * jnp.matmul(t_video.astype(jnp.float32),
                                               t_text.astype(jnp.float32).T,
                                               precision=PRECISION)
        unlabeled_loss = (teacher_student_nce_loss(student_scores, teacher_scores,
                                                   reduction="batchmean")
                          * ts_scale ** 2)

        total = labeled_loss_share * labeled_loss + unlabeled_loss_share * unlabeled_loss
        return total, ({"loss/train_labeled": labeled_loss,
                        "loss/train_unlabeled": unlabeled_loss},
                       bn_updates)

    def step(state: TrainState, teacher_params, batch: Batch):
        (total, (aux, bn_updates)), grads = jax.value_and_grad(loss, has_aux=True)(
            state.params, teacher_params, batch)
        new_state = apply_updates_with_clamp(state, grads, optimizer)
        new_state = _apply_bn_updates(student, new_state, bn_updates)
        metrics = dict(aux)
        metrics["loss/train"] = total
        metrics["temperature/labeled"] = 1.0 / jnp.exp(new_state.params["logit_scale"][0])
        metrics["temperature/unlabeled"] = 1.0 / jnp.exp(new_state.params["ts_logit_scale"][0])
        return new_state, metrics

    return step


def make_eval_step(encoder: VideoTextEncoder):
    """(params, batch{video, text}) -> (video_emb, text_emb) in fp32."""

    def step(encoder_params, batch: Batch):
        video_emb = encoder.encode_video(encoder_params, batch["video"])
        text_emb = encoder.encode_text(encoder_params, batch["text"])
        return video_emb.astype(jnp.float32), text_emb.astype(jnp.float32)

    return step


def make_video_only_eval_step(encoder: VideoTextEncoder):
    def step(encoder_params, video):
        return encoder.encode_video(encoder_params, video).astype(jnp.float32)

    return step
