#!/usr/bin/env python
"""Frame-vs-text similarity timeline (reference scripts/subcorr.py): encode a
video's frames individually with CLIP, score each frame against one or more
texts, and plot per-frame softmax probabilities over time to a PNG."""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args() -> argparse.Namespace:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("video_path", metavar="VIDEO_FILE")
    parser.add_argument("texts", metavar="TEXT", nargs="+")
    parser.add_argument("--output", default="subcorr.png")
    parser.add_argument("--encoder", default="ViT-B/16")
    parser.add_argument("--checkpoint-path", default=None)
    parser.add_argument("--bpe-path", default=os.environ.get("FITCLIP_BPE_PATH"))
    parser.add_argument("--stride", type=int, default=1, help="sample every Nth frame")
    parser.add_argument("--temperature", type=float, default=0.015)
    return parser.parse_args()


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from fitclip_tpu.data.transforms import eval_transform
    from fitclip_tpu.data.video_reader import VideoReader
    from fitclip_tpu.models.clip.load import load_clip_encoder

    args = parse_args()
    loaded = load_clip_encoder(name=args.encoder,
                               checkpoint_path=args.checkpoint_path,
                               bpe_path=args.bpe_path)
    encoder, params = loaded.encoder, loaded.params

    reader = VideoReader.from_path(args.video_path)
    indices = list(range(0, len(reader), args.stride))
    frames = eval_transform(reader(indices), encoder.preprocess.image_size)
    fps = reader.get_avg_fps()

    # Frames as 1-frame "videos" -> per-frame embeddings.
    video = jnp.asarray(frames[:, None])  # (N, 1, H, W, C) uint8
    frame_emb = np.asarray(jax.jit(encoder.encode_video)(params, video))
    ids = encoder.get_tokenizer()(list(args.texts))
    text_emb = np.asarray(jax.jit(encoder.encode_text)(params, jnp.asarray(ids)))

    scores = (frame_emb @ text_emb.T) / args.temperature  # (N, n_texts)
    probs = np.exp(scores - scores.max(1, keepdims=True))
    probs = probs / probs.sum(1, keepdims=True)
    times = np.asarray(indices) / fps

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(12, 4))
    for column, text in enumerate(args.texts):
        ax.plot(times, probs[:, column], label=text)
    ax.set_xlabel("time (s)")
    ax.set_ylabel("probability")
    ax.legend(loc="upper right", fontsize=8)
    fig.tight_layout()
    fig.savefig(args.output, dpi=120)
    print(f"wrote {args.output} ({len(indices)} frames, {len(args.texts)} texts)")


if __name__ == "__main__":
    main()
