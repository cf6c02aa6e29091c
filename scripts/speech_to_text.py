#!/usr/bin/env python
"""Transcribe an audio/video file to the Google-STT caption JSON the demo
consumes (demo/search.py caption format: per-word start/end times).

Mirrors the reference's GCP script (scripts/speech_to_text.py — long-running
recognize with word time offsets on the enhanced "video" model). Two
backends, picked automatically:

- google: when ``google-cloud-speech`` is importable and credentials are
  configured — the reference's exact request (word time offsets, word
  confidence, automatic punctuation, enhanced video model, diarization).
- null: everywhere else (e.g. this zero-egress environment) — exits with a
  clear error instead of pretending; pass ``--backend google`` to force.

    python scripts/speech_to_text.py AUDIO_OR_GS_PATH > captions/video_id.json
"""
import argparse
import json
import sys


def google_transcribe(path: str) -> str:
    from google.cloud.speech_v1p1beta1 import (RecognitionAudio,
                                               RecognitionConfig,
                                               RecognitionMetadata,
                                               SpeakerDiarizationConfig,
                                               SpeechClient)

    if path.startswith("gs://"):
        audio = RecognitionAudio(uri=path)
    else:
        with open(path, "rb") as file:
            audio = RecognitionAudio(content=file.read())

    kwargs = {"audio_channel_count": 2}
    if path.endswith(".opus"):
        # Ogg-Opus needs the encoding + rate spelled out.
        kwargs["encoding"] = RecognitionConfig.AudioEncoding.OGG_OPUS
        kwargs["sample_rate"] = 48000
    else:
        kwargs["encoding"] = RecognitionConfig.AudioEncoding.ENCODING_UNSPECIFIED

    metadata = RecognitionMetadata(
        original_media_type=RecognitionMetadata.OriginalMediaType.VIDEO)
    config = RecognitionConfig(
        language_code="en-US", enable_word_time_offsets=True,
        enable_word_confidence=True, enable_automatic_punctuation=True,
        use_enhanced=True, model="video", metadata=metadata,
        diarization_config=SpeakerDiarizationConfig(
            enable_speaker_diarization=True, min_speaker_count=1,
            max_speaker_count=10),
        **kwargs)
    response = SpeechClient().long_running_recognize(config=config, audio=audio)
    result = response.result(timeout=10000)
    return type(result).to_json(result)


def main() -> None:
    parser = argparse.ArgumentParser()
    parser.add_argument("path", help="local audio/video file or gs:// URI")
    parser.add_argument("--backend", choices=["auto", "google"], default="auto")
    args = parser.parse_args()

    try:
        import google.cloud.speech_v1p1beta1  # noqa: F401
        have_google = True
    except ImportError:
        have_google = False

    if not have_google:
        sys.exit("speech_to_text: the google-cloud-speech SDK is not "
                 "installed in this environment. Install it (and configure "
                 "GOOGLE_APPLICATION_CREDENTIALS) to transcribe; the output "
                 "JSON feeds demo/search.py's caption loader.")
    output = google_transcribe(args.path)
    json.loads(output)  # sanity: emit valid JSON only
    print(output)


if __name__ == "__main__":
    main()
