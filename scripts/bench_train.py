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
    parser.add_argument("--no-fused", action="store_true",
                        help="einsum attention instead of the Pallas kernel")
    args = parser.parse_args()

    encoder = ClipVideoTextEncoder(CLIPConfig.vit_b_16(), num_frames=4,
                                   dtype=jnp.bfloat16,
                                   fused_attention=not args.no_fused,
                                   remat=args.remat)
    params = encoder.init_params(jax.random.PRNGKey(0))
    optimizer = make_optimizer(3e-6)
    rng = np.random.default_rng(0)
    size = encoder.preprocess.image_size

    def video_batch(n):
        return jnp.asarray(rng.normal(size=(n, 4, size, size, 3)).astype(np.float32),
                           dtype=jnp.bfloat16)

    def text_batch(n):
        return jnp.asarray(rng.integers(1, 49408, size=(n, 77)).astype(np.int32))

    for case in args.cases.split(","):
        if case == "contrastive":
            state = jax.device_put(init_train_state(params, optimizer))
            train_step = make_contrastive_train_step(encoder, optimizer)
            batch = {"video": video_batch(args.batch), "text": text_batch(args.batch)}
            clips_per_step = args.batch

            def body(i, state):
                state, _ = train_step(state, batch)
                return state
        else:
            teacher_params = jax.device_put(encoder.init_params(jax.random.PRNGKey(1)))
            state = jax.device_put(init_train_state(
                params, optimizer, with_teacher_student_scale=True))
            train_step = make_teacher_student_train_step(
                encoder, encoder, optimizer, labeled_loss_share=0.9999)
            half = max(1, args.batch // 4)  # dual views double the video work
            sub = lambda: {  # noqa: E731
                "video_student": video_batch(half), "text_student": text_batch(half),
                "video_teacher": video_batch(half), "text_teacher": text_batch(half)}
            batch = {"labeled": sub(), "unlabeled": sub()}
            clips_per_step = 2 * half

            def body(i, state):
                state, _ = train_step(state, teacher_params, batch)
                return state

        # In-jit chained steps (state threads through the fori_loop carry):
        # the only timing pattern that survives this environment's async,
        # dedup-happy relay (utils/benchmarking.py rationale).
        @jax.jit
        def chain(steps, state):
            return jax.lax.fori_loop(0, steps, body, state)

        try:
            seconds = sustained_seconds_per_step(
                lambda s: chain(jnp.int32(s), state).params["logit_scale"],
                short_steps=2, long_steps=8)
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
            "remat": args.remat,
        }), flush=True)


if __name__ == "__main__":
    main()
