#!/usr/bin/env python
"""Transcribe audio/video to the per-word-timestamped caption JSON the demo
consumes (demo/search.py caption format).

Capability match for the reference's GCP transcription step (SURVEY §2.7):
long-running recognition with word time offsets so each word carries
start/end times. Uses Google Cloud Speech when its SDK + credentials are
available; exits with a clear message otherwise (this build environment has
no egress). The flags below expose what the reference hard-coded.

    python scripts/speech_to_text.py clip.opus > captions/clip.json
    python scripts/speech_to_text.py gs://bucket/clip.flac --model default
"""
import argparse
import json
import sys


def _audio_source(path: str):
    """A RecognitionAudio for a local file or a gs:// object."""
    from google.cloud import speech_v1p1beta1 as speech

    if path.startswith("gs://"):
        return speech.RecognitionAudio(uri=path)
    with open(path, "rb") as file:
        return speech.RecognitionAudio(content=file.read())


def _recognition_config(args):
    from google.cloud import speech_v1p1beta1 as speech

    options = {
        "language_code": args.language,
        "enable_word_time_offsets": True,   # the demo needs per-word times
        "enable_word_confidence": True,
        "enable_automatic_punctuation": True,
        "model": args.model,
        "use_enhanced": args.model == "video",
        "audio_channel_count": args.channels,
        "metadata": speech.RecognitionMetadata(
            original_media_type=(
                speech.RecognitionMetadata.OriginalMediaType.VIDEO)),
    }
    if args.diarization:
        options["diarization_config"] = speech.SpeakerDiarizationConfig(
            enable_speaker_diarization=True, min_speaker_count=1,
            max_speaker_count=args.max_speakers)
    encoding = speech.RecognitionConfig.AudioEncoding
    if args.path.endswith(".opus"):
        # Ogg-Opus requires the encoding and rate to be explicit.
        options["encoding"] = encoding.OGG_OPUS
        options["sample_rate_hertz"] = args.opus_rate
    else:
        options["encoding"] = encoding.ENCODING_UNSPECIFIED
    return speech.RecognitionConfig(**options)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("path", help="local audio/video file or gs:// URI")
    parser.add_argument("--language", default="en-US")
    parser.add_argument("--model", default="video",
                        help="video (enhanced) / default / phone_call ...")
    parser.add_argument("--channels", type=int, default=2)
    parser.add_argument("--opus-rate", type=int, default=48000)
    parser.add_argument("--diarization", action="store_true", default=True)
    parser.add_argument("--max-speakers", type=int, default=10)
    parser.add_argument("--timeout", type=float, default=10000.0)
    args = parser.parse_args()

    try:
        from google.cloud import speech_v1p1beta1 as speech
    except ImportError:
        sys.exit("speech_to_text: the google-cloud-speech SDK is not "
                 "installed in this environment. Install it (and configure "
                 "GOOGLE_APPLICATION_CREDENTIALS) to transcribe; the output "
                 "JSON feeds demo/search.py's caption loader.")

    operation = speech.SpeechClient().long_running_recognize(
        config=_recognition_config(args), audio=_audio_source(args.path))
    response = operation.result(timeout=args.timeout)
    payload = type(response).to_json(response)
    json.loads(payload)  # emit valid JSON only
    print(payload)


if __name__ == "__main__":
    main()
