"""Online embedding service: the serving-side counterpart of the
subtitle-search demo (demo/app.py serves PREcomputed embeddings, mirroring
the reference demo/app.py; this service computes embeddings ON the chip per
request, through the dynamic batcher in fitclip_tpu/serving/).

Endpoints:
- POST /embed_text   body {"texts": ["a cat", ...]}
      -> {"embeddings": [[...], ...], "dim": D}
      Each text is tokenized and submitted individually; the batcher
      coalesces concurrent requests into one bucket-padded device call.
- POST /embed_video[?format=mp4]   body = raw video container bytes
      -> {"embedding": [...], "dim": D}
      Decoded (native FFmpeg ext / OpenCV fallback), eval-frame-sampled and
      transformed exactly like the eval data pipeline (same
      build_pipeline(train=False)), then batched through the video tower.
- GET  /search_videos?q=<text>&top_k=10   (requires EMBED_INDEX)
      -> {"results": [{"video_id": ..., "score": ...}, ...]}
      Text-to-video retrieval over a precomputed index: the query embeds
      online through the batched text tower, ranking is cosine against the
      ``command=predict`` dump (predictions .pt/.npz with encoded_videos +
      video_ids).
- GET  /health       -> stats JSON (requests, batches, mean batch fill)

Server surfaces (same split as demo/app.py):
- stdlib: ``EMBED_ENCODER=clip_vit_b_32 python -m demo.embed_service [port]``
- WSGI:   ``gunicorn "demo.embed_service"`` (module-level ``application``).
  NOTE: run ONE worker per chip — each worker owns the device; scale-out is
  more processes on more chips behind the load balancer, not threads.

Env:
- EMBED_ENCODER     config/encoder/<name>.yaml to serve (required)
- EMBED_CHECKPOINT  optional orbax dir / torch .pt for fine-tuned weights
- EMBED_MAX_WAIT_MS batching window after the first request (default 2)
- EMBED_MAX_BATCH   largest text bucket (default 32)
- EMBED_MAX_VIDEO_BATCH  largest video bucket (default 8)
- EMBED_MAX_VIDEO_MB     request-size cap for /embed_video (default 64)
- EMBED_INDEX       predictions .pt/.npz from ``command=predict`` to serve
                    /search_videos from
- EMBED_COMPILE_CACHE  persistent XLA executable cache dir: restarted
  workers load their bucket programs instead of re-compiling (see
  fitclip_tpu/serving/export.py)
- EMBED_EXPORT_DIR  serve from scripts/export_serving.py's jax.export
  artifacts (version-pinned StableHLO per tower/bucket + one params
  file) instead of tracing the encoder in-process; bucket sizes come
  from the artifact set
- EMBED_PLATFORM    pin the jax backend (e.g. "cpu", "tpu"). Goes through
                    jax.config.update — on hosts where sitecustomize
                    imports jax before user code, the JAX_PLATFORMS env
                    var alone cannot override the platform anymore.

The video tower warms up lazily on the first /embed_video request (its
bucket compiles are the expensive ones); the text tower warms at startup.
"""

import json
import os
import sys
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Sequence, Tuple

import numpy as np


class TextEmbedService:
    """Tokenizer + dynamic-batched text tower of one encoder."""

    def __init__(self, encoder, params, bucket_sizes: Sequence[int],
                 max_wait_ms: float, encode_fn=None):
        import jax

        from fitclip_tpu.serving import BatchServer

        self._tokenize = encoder.get_tokenizer()
        context_len = self._tokenize(["warmup"]).shape[-1]

        if encode_fn is None:
            params = jax.device_put(params)
            # Params ride as a jit ARGUMENT, not a closure capture: captured
            # arrays serialize into the program as HLO constants, which blows
            # remote-compile request limits at real model sizes (and bloats
            # the compile cache). As an argument only their shapes serialize.
            encode_jit = jax.jit(encoder.encode_text)
            encode_fn = lambda ids: encode_jit(params, ids)

        self.server = BatchServer(
            encode_fn,
            item_shape=(context_len,), dtype=np.int32,
            bucket_sizes=bucket_sizes, max_wait_ms=max_wait_ms)

    def start(self) -> "TextEmbedService":
        self.server.start()
        return self

    def stop(self) -> None:
        self.server.stop()

    def embed_texts(self, texts: Sequence[str]) -> np.ndarray:
        """(N texts) -> (N, D). Rows are submitted individually so distinct
        HTTP requests share device batches."""
        ids = np.asarray(self._tokenize(list(texts)), np.int32)
        futures = [self.server.submit(row) for row in ids]
        return np.stack([f.result() for f in futures])


class VideoEmbedService:
    """Eval data pipeline (decode -> frame-sample -> transform) + the
    dynamic-batched video tower. Preprocessing is the SAME
    build_pipeline(train=False) the eval loader uses, so a served embedding
    matches the offline eval path bit-for-bit."""

    def __init__(self, encoder, params, bucket_sizes: Sequence[int],
                 max_wait_ms: float, encode_fn=None):
        import jax

        from fitclip_tpu.data.data_module import build_pipeline
        from fitclip_tpu.serving import BatchServer

        spec = encoder.preprocess
        self._pipeline = build_pipeline(encoder, train=False)
        self._num_frames = spec.pad_to_min_frames or spec.num_frames
        size = spec.image_size

        if encode_fn is None:
            params = jax.device_put(params)
            # Params as a jit argument — see TextEmbedService.
            encode_jit = jax.jit(encoder.encode_video)
            encode_fn = lambda videos: encode_jit(params, videos)

        self.server = BatchServer(
            encode_fn,
            item_shape=(self._num_frames, size, size, 3),
            dtype=np.uint8, bucket_sizes=bucket_sizes,
            max_wait_ms=max_wait_ms)

    def start(self, warmup: bool = True) -> "VideoEmbedService":
        self.server.start(warmup=warmup)
        return self

    def stop(self) -> None:
        self.server.stop()

    def preprocess_bytes(self, data: bytes, fmt: str = "mp4") -> np.ndarray:
        """Raw container bytes -> (F, S, S, 3) uint8 eval clip."""
        import tempfile

        from fitclip_tpu.data.transforms import pad_to_min_frames
        from fitclip_tpu.data.video_reader import VideoReader

        if not fmt.isalnum():
            raise ValueError(f"bad format {fmt!r}")
        with tempfile.NamedTemporaryFile(suffix=f".{fmt}") as handle:
            handle.write(data)
            handle.flush()
            try:
                reader = VideoReader.from_path(handle.name)
                # Batch eval zero-fills undecodable clips (decord-parity
                # tolerance); an online API rejects them instead.
                if not reader.ok or len(reader) == 0:
                    raise ValueError
                indices = self._pipeline.sampler(0, len(reader) - 1,
                                                 fps=reader.get_avg_fps())
                frames = reader(indices)
            except ValueError:
                raise ValueError("could not decode any frames") from None
            except Exception as error:  # decoder backends raise their own
                raise ValueError(f"could not decode video: {error}") from None
        clip = self._pipeline.transform(frames, None)
        # Short clips right-pad with zero frames — the eval collate's
        # stack_padded semantics (utils/tensor.py).
        return pad_to_min_frames(clip, self._num_frames).astype(np.uint8)

    def embed_video_bytes(self, data: bytes, fmt: str = "mp4") -> np.ndarray:
        return self.server.submit(self.preprocess_bytes(data, fmt)).result()


class RetrievalIndex:
    """Precomputed video embeddings + ids from ``command=predict``; query
    ranking is a host-side cosine (embeddings are re-normalized at load —
    CLIP's frame-mean-pooled clip embeddings have norm < 1). For indexes
    past host-matmul scale, shard the matrix onto the chip instead."""

    def __init__(self, path: str):
        if path.endswith(".npz"):
            data = np.load(path)
            videos, ids = data["encoded_videos"], data["video_ids"]
        else:
            from fitclip_tpu.convert.pt_reader import load_pt

            data = load_pt(path)
            videos = np.asarray(data["encoded_videos"], np.float32)
            ids = data["video_ids"]
        norms = np.linalg.norm(videos, axis=-1, keepdims=True)
        self.videos = np.asarray(videos, np.float32) / np.maximum(norms, 1e-8)
        self.video_ids = [str(v) for v in ids]
        if len(self.video_ids) != self.videos.shape[0]:
            raise ValueError("index ids/embeddings length mismatch")

    def search(self, query_emb: np.ndarray, top_k: int):
        q = np.asarray(query_emb, np.float32)
        q = q / max(float(np.linalg.norm(q)), 1e-8)
        scores = self.videos @ q
        top = np.argsort(-scores)[: max(1, top_k)]
        return [{"video_id": self.video_ids[i],
                 "score": round(float(scores[i]), 6)} for i in top]


_SERVICE: Optional[TextEmbedService] = None
_VIDEO_SERVICE: Optional[VideoEmbedService] = None
_INDEX: Optional[RetrievalIndex] = None
_LOADED = None
_SERVICE_LOCK = threading.Lock()


def _load_encoder():
    """Instantiate (once) the encoder named by EMBED_ENCODER."""
    from fitclip_tpu.cli.main import (DEFAULT_CONFIG_DIR,
                                      _maybe_load_checkpoint,
                                      instantiate_encoder_slot)
    from fitclip_tpu.config_engine import compose

    platform = os.environ.get("EMBED_PLATFORM")
    if platform:
        import jax

        jax.config.update("jax_platforms", platform)
    cache_dir = os.environ.get("EMBED_COMPILE_CACHE")
    if cache_dir:
        # Persistent XLA executable cache: a restarted worker loads the
        # bucket programs it compiled last time instead of re-compiling
        # (minutes per Pallas program through the remote relay).
        from fitclip_tpu.serving.export import enable_compilation_cache

        enable_compilation_cache(cache_dir)

    name = os.environ.get("EMBED_ENCODER")
    if not name:
        raise SystemExit("Set EMBED_ENCODER to a config/encoder/ name")
    config_dir = os.environ.get("FITCLIP_CONFIG_DIR", DEFAULT_CONFIG_DIR)
    cfg = compose(config_dir, "trainer",
                  ["command=evaluate", f"encoder={name}", "data=msrvtt"])
    loaded = instantiate_encoder_slot(cfg["encoder"])
    if isinstance(loaded, dict):
        raise SystemExit(f"{name} is a {{student,teacher}} slot — serve one "
                         "tower's encoder config instead")
    loaded = _maybe_load_checkpoint(loaded, os.environ.get("EMBED_CHECKPOINT"))
    return type(loaded)(encoder=loaded.encoder,
                        params=prepare_quantized_params(
                            loaded.encoder, loaded.params,
                            os.environ.get("EMBED_SCALES")))


def prepare_quantized_params(encoder, params, scales_path: Optional[str]):
    """int8 encoders need calibrated activation scales before any encode is
    valid. Serving NEVER calibrates on live traffic (a skewed first request
    would set every scale) — it requires scales persisted by an offline
    eval run (``command=evaluate ++encoder.dtype=int8
    ++quant.scales_path=scales.npz``), loaded here via EMBED_SCALES."""
    if not getattr(encoder, "quantized", False):
        return params
    if not scales_path or not os.path.exists(scales_path):
        raise SystemExit(
            "quantized encoder: set EMBED_SCALES to the .npz written by an "
            "offline eval with ++quant.scales_path=... (serving never "
            "calibrates on live traffic)")
    from fitclip_tpu.ops.quant import load_act_scales, require_calibrated

    params = load_act_scales(scales_path, params)
    # Fail closed even if the .npz itself holds the uncalibrated sentinel.
    require_calibrated(params, context="serving")
    return params


def _ensure_loaded():
    global _LOADED
    if _LOADED is None:
        _LOADED = _load_encoder()
    return _LOADED


def _exported_encode(name: str):
    """(encode_fn, bucket_sizes) from EMBED_EXPORT_DIR's jax.export
    artifacts (scripts/export_serving.py), or (None, None)."""
    export_dir = os.environ.get("EMBED_EXPORT_DIR")
    if not export_dir:
        return None, None
    from fitclip_tpu.serving.export import load_exported

    encode_fn, per_bucket = load_exported(export_dir, name)
    return encode_fn, sorted(per_bucket)


def build_service() -> TextEmbedService:
    loaded = _ensure_loaded()
    encode_fn, buckets = _exported_encode("text")
    if buckets is None:
        max_batch = int(os.environ.get("EMBED_MAX_BATCH", "32"))
        buckets = [b for b in (1, 2, 4, 8, 16, 32, 64, 128) if b <= max_batch]
    service = TextEmbedService(
        loaded.encoder, loaded.params, bucket_sizes=buckets,
        max_wait_ms=float(os.environ.get("EMBED_MAX_WAIT_MS", "2")),
        encode_fn=encode_fn)
    return service.start()


def build_video_service() -> VideoEmbedService:
    loaded = _ensure_loaded()
    encode_fn, buckets = _exported_encode("video")
    if buckets is None:
        max_batch = int(os.environ.get("EMBED_MAX_VIDEO_BATCH", "8"))
        buckets = [b for b in (1, 2, 4, 8, 16, 32) if b <= max_batch]
    service = VideoEmbedService(
        loaded.encoder, loaded.params, bucket_sizes=buckets,
        max_wait_ms=float(os.environ.get("EMBED_MAX_WAIT_MS", "2")),
        encode_fn=encode_fn)
    return service.start()


def _ensure_service() -> TextEmbedService:
    global _SERVICE
    with _SERVICE_LOCK:
        if _SERVICE is None:
            _SERVICE = build_service()
    return _SERVICE


def _ensure_video_service() -> VideoEmbedService:
    global _VIDEO_SERVICE
    with _SERVICE_LOCK:
        if _VIDEO_SERVICE is None:
            _VIDEO_SERVICE = build_video_service()
    return _VIDEO_SERVICE


def _ensure_index() -> RetrievalIndex:
    global _INDEX
    with _SERVICE_LOCK:
        if _INDEX is None:
            path = os.environ.get("EMBED_INDEX")
            if not path or not os.path.exists(path):
                raise FileNotFoundError(
                    "no retrieval index — set EMBED_INDEX to a "
                    "command=predict dump (.pt/.npz)")
            _INDEX = RetrievalIndex(path)
    return _INDEX


def _handle(method: str, path: str, body: bytes,
            query_string: str = "") -> Tuple[int, bytes]:
    """Shared request logic for both server surfaces -> (status, JSON)."""
    from urllib.parse import parse_qs

    from fitclip_tpu.serving.batcher import ServerOverloaded

    if path == "/embed_video" and method == "POST":
        limit = int(os.environ.get("EMBED_MAX_VIDEO_MB", "64")) * 2 ** 20
        if len(body) > limit:
            return 413, json.dumps({
                "status": 413,
                "message": f"video over {limit >> 20} MB"}).encode()
        if not body:
            return 400, json.dumps(
                {"status": 400,
                 "message": "body must be raw video bytes"}).encode()
        fmt = parse_qs(query_string).get("format", ["mp4"])[0]
        try:
            embedding = _ensure_video_service().embed_video_bytes(body, fmt)
            return 200, json.dumps({
                "embedding": embedding.astype(float).tolist(),
                "dim": int(embedding.shape[-1])}).encode()
        except ServerOverloaded as error:
            return 503, json.dumps({"status": 503,
                                    "message": str(error)}).encode()
        except ValueError as error:
            return 400, json.dumps({"status": 400,
                                    "message": str(error)}).encode()
        except Exception as error:  # noqa: BLE001 - surfaced to the client
            return 500, json.dumps({"status": 500,
                                    "message": repr(error)}).encode()
    if path == "/search_videos" and method == "GET":
        try:
            query = parse_qs(query_string)
            text = query.get("q", [""])[0]
            if not text:
                return 400, json.dumps(
                    {"status": 400, "message": "missing ?q=<text>"}).encode()
            top_k = int(query.get("top_k", ["10"])[0])
            index = _ensure_index()
            query_emb = _ensure_service().embed_texts([text])[0]
            return 200, json.dumps(
                {"results": index.search(query_emb, top_k)}).encode()
        except FileNotFoundError as error:
            return 503, json.dumps({"status": 503,
                                    "message": str(error)}).encode()
        except ServerOverloaded as error:
            return 503, json.dumps({"status": 503,
                                    "message": str(error)}).encode()
        except Exception as error:  # noqa: BLE001 - surfaced to the client
            return 500, json.dumps({"status": 500,
                                    "message": repr(error)}).encode()
    if path == "/health":
        stats = _ensure_service().server.stats
        payload = {"status": "ok", "requests": stats.requests,
                   "batches": stats.batches,
                   "mean_batch_fill": round(stats.mean_batch_fill, 4)}
        if _VIDEO_SERVICE is not None:
            vstats = _VIDEO_SERVICE.server.stats
            payload["video"] = {"requests": vstats.requests,
                                "batches": vstats.batches,
                                "mean_batch_fill":
                                    round(vstats.mean_batch_fill, 4)}
        return 200, json.dumps(payload).encode()
    if path == "/embed_text" and method == "POST":
        try:
            texts = json.loads(body or b"{}").get("texts")
            if (not isinstance(texts, list) or not texts
                    or not all(isinstance(t, str) for t in texts)):
                return 400, json.dumps(
                    {"status": 400,
                     "message": 'body must be {"texts": [str, ...]}'}).encode()
            embeddings = _ensure_service().embed_texts(texts)
            return 200, json.dumps({
                "embeddings": embeddings.astype(float).tolist(),
                "dim": int(embeddings.shape[-1])}).encode()
        except ServerOverloaded as error:
            return 503, json.dumps({"status": 503,
                                    "message": str(error)}).encode()
        except Exception as error:  # noqa: BLE001 - surfaced to the client
            return 500, json.dumps({"status": 500,
                                    "message": repr(error)}).encode()
    return 404, json.dumps({"status": 404}).encode()


class Handler(BaseHTTPRequestHandler):
    def _respond(self, method: str) -> None:
        from urllib.parse import urlparse

        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length) if length else b""
        parsed = urlparse(self.path)
        status, payload = _handle(method, parsed.path, body, parsed.query)
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Content-Length", str(len(payload)))
        self.end_headers()
        self.wfile.write(payload)

    def do_GET(self):  # noqa: N802
        self._respond("GET")

    def do_POST(self):  # noqa: N802
        self._respond("POST")

    def log_message(self, *args):
        pass


_STATUS_LINES = {200: "200 OK", 400: "400 Bad Request", 404: "404 Not Found",
                 413: "413 Content Too Large",
                 500: "500 Internal Server Error",
                 503: "503 Service Unavailable"}


def application(environ, start_response) -> List[bytes]:
    """WSGI entry point (gunicorn 'demo.embed_service')."""
    length = int(environ.get("CONTENT_LENGTH") or 0)
    body = environ["wsgi.input"].read(length) if length else b""
    status, payload = _handle(environ.get("REQUEST_METHOD", "GET"),
                              environ.get("PATH_INFO", "/"), body,
                              environ.get("QUERY_STRING", ""))
    start_response(_STATUS_LINES.get(status, f"{status} "), [
        ("Content-Type", "application/json"),
        ("Access-Control-Allow-Origin", "*"),
        ("Content-Length", str(len(payload))),
    ])
    return [payload]


def main() -> None:
    _ensure_service()
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8081
    print(f"Embedding service ({os.environ.get('EMBED_ENCODER')}) on :{port}")
    ThreadingHTTPServer(("0.0.0.0", port), Handler).serve_forever()


if __name__ == "__main__":
    main()
