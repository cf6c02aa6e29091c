#!/usr/bin/env python
"""Training-step throughput on one chip: contrastive fine-tune and
teacher-student distillation steps (forward + backward + AdamW + temperature
clamp) at ViT-B/16 scale, chained-dispatch timed. One JSON line per case."""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.clip import CLIPConfig
    from fitclip_tpu.models.clip.encoder import ClipVideoTextEncoder
    from fitclip_tpu.training.state import init_train_state, make_optimizer
    from fitclip_tpu.training.steps import (make_contrastive_train_step,
                                            make_teacher_student_train_step)
    from fitclip_tpu.utils.benchmarking import sustained_seconds_per_step

    parser = argparse.ArgumentParser()
    parser.add_argument("--batch", type=int,
                        default=int(os.environ.get("BENCH_TRAIN_BATCH", "32")))
    parser.add_argument("--cases", default="contrastive,teacher_student")
    parser.add_argument("--remat", action="store_true")
    parser.add_argument("--remat-policy", choices=["full", "dots"],
                        default="full",
                        help="dots = save matmul outputs, recompute eltwise")
    parser.add_argument("--no-fused", action="store_true",
                        help="einsum attention instead of the Pallas kernel")
    parser.add_argument("--optax-adamw", action="store_true",
                        help="two-pass optax chain instead of FusedAdamW")
    args = parser.parse_args()

    remat = ("dots" if args.remat and args.remat_policy == "dots"
             else args.remat)
    encoder = ClipVideoTextEncoder(CLIPConfig.vit_b_16(), num_frames=4,
                                   dtype=jnp.bfloat16,
                                   fused_attention=not args.no_fused,
                                   remat=remat)
    params = encoder.init_params(jax.random.PRNGKey(0))
    optimizer = make_optimizer(3e-6, fused=not args.optax_adamw)
    rng = np.random.default_rng(0)
    size = encoder.preprocess.image_size

    def video_batch(n):
        return jnp.asarray(rng.normal(size=(n, 4, size, size, 3)).astype(np.float32),
                           dtype=jnp.bfloat16)

    def text_batch(n):
        return jnp.asarray(rng.integers(1, 49408, size=(n, 77)).astype(np.int32))

    for case in args.cases.split(","):
        if case == "teacher_student_split":
            # The relay's request-size cap (HTTP 413) rejects the one-program
            # teacher-student step; time it as two separately-compiled pieces
            # whose sum upper-bounds the real fused step: (A) the student
            # fwd+bwd+AdamW with the teacher's embeddings as INPUTS, (B) the
            # teacher's forward. Loss math mirrors
            # training/steps.make_teacher_student_train_step.
            from fitclip_tpu.ops.losses import nce_loss, teacher_student_nce_loss
            from fitclip_tpu.training.state import apply_updates_with_clamp

            half = max(1, args.batch // 4)
            state = jax.device_put(init_train_state(
                params, optimizer, with_teacher_student_scale=True))
            teacher_params = jax.device_put(encoder.init_params(jax.random.PRNGKey(1)))
            l_video, u_video = video_batch(half), video_batch(half)
            l_text, u_text_ids = text_batch(half), text_batch(half)
            t_video_in, t_text_in = video_batch(half), text_batch(half)
            clips_per_step = 2 * half

            def student_piece(state, t_video_emb, t_text_emb, l_video, u_video,
                              l_text, u_text_ids):
                def loss(p):
                    all_v = jnp.concatenate([l_video, u_video])
                    all_t = jnp.concatenate([l_text, u_text_ids])
                    v_emb = encoder.encode_video(p["encoder"], all_v)
                    t_emb = encoder.encode_text(p["encoder"], all_t)
                    scale = jnp.exp(p["logit_scale"][0])
                    labeled = nce_loss(scale * v_emb[:half].astype(jnp.float32)
                                       @ t_emb[:half].astype(jnp.float32).T)
                    s_scores = (scale * v_emb[half:].astype(jnp.float32)
                                @ t_emb[half:].astype(jnp.float32).T)
                    ts_scale = jnp.exp(p["ts_logit_scale"][0])
                    t_scores = ts_scale * (t_video_emb @ t_text_emb.T)
                    unlabeled = teacher_student_nce_loss(
                        s_scores, t_scores, reduction="batchmean") * ts_scale ** 2
                    return 0.5 * labeled + 0.5 * unlabeled
                grads = jax.grad(loss)(state.params)
                return apply_updates_with_clamp(state, grads, optimizer)

            def teacher_piece(tp, video, text, bump):
                v = encoder.encode_video(
                    tp, video * (1 + bump * 1e-6).astype(video.dtype))
                t = encoder.encode_text(tp, text)
                return v.astype(jnp.float32), t.astype(jnp.float32)

            t_v_emb, t_t_emb = jax.jit(teacher_piece)(
                teacher_params, t_video_in, t_text_in, jnp.float32(0.0))

            @jax.jit
            def chain_student(steps, state, t_v_emb, t_t_emb, l_video, u_video,
                              l_text, u_text_ids):
                def body(i, s):
                    return student_piece(s, t_v_emb, t_t_emb, l_video, u_video,
                                         l_text, u_text_ids)
                return jax.lax.fori_loop(0, steps, body, state)

            @jax.jit
            def chain_teacher(steps, teacher_params, video, text, bump):
                def body(i, carry):
                    v, t = teacher_piece(teacher_params, video, text, carry)
                    return carry + (jnp.abs(v).sum() + jnp.abs(t).sum() > 0
                                    ).astype(jnp.float32)
                return jax.lax.fori_loop(0, steps, body, bump)

            student_s = sustained_seconds_per_step(
                lambda s: chain_student(jnp.int32(s), state, t_v_emb, t_t_emb,
                                        l_video, u_video, l_text, u_text_ids
                                        ).params["logit_scale"],
                short_steps=2, long_steps=8)
            teacher_s = sustained_seconds_per_step(
                lambda s: chain_teacher(jnp.int32(s), teacher_params,
                                        t_video_in, t_text_in, jnp.float32(0.0)),
                short_steps=2, long_steps=8)
            seconds = student_s + teacher_s
            print(json.dumps({
                "metric": "train_step_teacher_student_split",
                "value": round(clips_per_step / seconds, 1),
                "unit": "clips/sec/chip",
                "ms_per_step": round(seconds * 1e3, 1),
                "student_ms": round(student_s * 1e3, 1),
                "teacher_ms": round(teacher_s * 1e3, 1),
                "batch_clips": clips_per_step,
                "method": "sum of separately-compiled pieces (relay 413 cap); "
                          "upper-bounds the fused step",
            }), flush=True)
            continue
        if case in ("contrastive", "rn50_contrastive", "contrastive_bf16m"):
            # contrastive_bf16m: the same step with bf16-stored AdamW
            # moments (VERDICT r4 #4) — same-session A/B against the fp32
            # "contrastive" arm; parity gate in tests/test_fused_optimizer.
            case_optimizer = (make_optimizer(3e-6, fused=True,
                                             moment_dtype="bfloat16")
                              if case == "contrastive_bf16m" else optimizer)
            if case == "rn50_contrastive":
                # CLIP RN50 trains with live batch-stats BN (EMA merge
                # through the step). BENCH_RN_DTYPE=fp32 measures the
                # pre-fix path where the tower ignored the compute dtype
                # (fp32 emulated convs).
                from fitclip_tpu.models.clip.resnet_clip import (
                    RESNET_PRESETS, ResNetClipVideoTextEncoder)

                rn_dtype = (jnp.float32
                            if os.environ.get("BENCH_RN_DTYPE") == "fp32"
                            else jnp.bfloat16)
                case_encoder = ResNetClipVideoTextEncoder(
                    RESNET_PRESETS["RN50"], num_frames=4, dtype=rn_dtype)
                case_params = case_encoder.init_params(jax.random.PRNGKey(0))
            else:
                case_encoder, case_params = encoder, params
            state = jax.device_put(init_train_state(case_params, case_optimizer))
            train_step = make_contrastive_train_step(case_encoder, case_optimizer)
            batch = {"video": video_batch(args.batch), "text": text_batch(args.batch)}
            clips_per_step = args.batch

            # Batch rides as a jit ARGUMENT (only its shape serializes) — a
            # closure capture would embed megabytes of constants into the
            # program body, which is what trips the relay's request cap.
            @jax.jit
            def chain(steps, state, batch):
                def body(i, s):
                    s, _ = train_step(s, batch)
                    return s
                return jax.lax.fori_loop(0, steps, body, state)

            def timed(s, state=state, batch=batch, chain=chain):
                return chain(jnp.int32(s), state, batch).params["logit_scale"]
        else:
            if case == "teacher_student_int8_teacher":
                # Inference-form teacher: the frozen tower never receives
                # gradients (stop_gradient in the step), so it can run the
                # int8 whole-layer megakernel — the same config run_train
                # accepts for the teacher slot (cli/train_runner.py).
                from fitclip_tpu.ops.quant import quantize_clip_params

                teacher_encoder = ClipVideoTextEncoder(
                    CLIPConfig.vit_b_16(), num_frames=4, dtype=jnp.bfloat16,
                    fused_attention=True, quantized=True)
                qp = quantize_clip_params(jax.device_get(params))
                qp = teacher_encoder.calibrate(qp, video_batch(4), text_batch(4))
                teacher_params = jax.device_put(qp)
            else:
                teacher_encoder = encoder
                teacher_params = jax.device_put(
                    encoder.init_params(jax.random.PRNGKey(1)))
            state = jax.device_put(init_train_state(
                params, optimizer, with_teacher_student_scale=True))
            train_step = make_teacher_student_train_step(
                encoder, teacher_encoder, optimizer, labeled_loss_share=0.9999)
            half = max(1, args.batch // 4)  # dual views double the video work
            sub = lambda: {  # noqa: E731
                "video_student": video_batch(half), "text_student": text_batch(half),
                "video_teacher": video_batch(half), "text_teacher": text_batch(half)}
            batch = {"labeled": sub(), "unlabeled": sub()}
            clips_per_step = 2 * half

            @jax.jit
            def chain(steps, state, teacher_params, batch):
                def body(i, s):
                    s, _ = train_step(s, teacher_params, batch)
                    return s
                return jax.lax.fori_loop(0, steps, body, state)

            def timed(s):
                return chain(jnp.int32(s), state, teacher_params,
                             batch).params["logit_scale"]

        # In-jit chained steps (state threads through the fori_loop carry):
        # the only timing pattern that survives this environment's async,
        # dedup-happy relay (utils/benchmarking.py rationale).
        try:
            seconds = sustained_seconds_per_step(timed, short_steps=2,
                                                 long_steps=8)
        except Exception as error:  # noqa: BLE001 - environment limits below
            message = str(error)
            if "413" in message or "length limit" in message:
                # This environment's remote-compile relay caps the request
                # body; the teacher-student step's serialized program (two
                # towers x dual views inside the timing loop) exceeds it.
                print(json.dumps({"metric": f"train_step_{case}",
                                  "skipped": "relay compile size limit (413)"}),
                      flush=True)
                continue
            raise
        print(json.dumps({
            "metric": f"train_step_{case}",
            "value": round(clips_per_step / seconds, 1),
            "unit": "clips/sec/chip",
            "ms_per_step": round(seconds * 1e3, 1),
            "batch_clips": clips_per_step,
            "fused_attention": not args.no_fused,
            "remat": remat,
        }), flush=True)


if __name__ == "__main__":
    main()
