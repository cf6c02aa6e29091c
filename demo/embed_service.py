"""Online text-embedding service: the serving-side counterpart of the
subtitle-search demo (demo/app.py serves PREcomputed embeddings, mirroring
the reference demo/app.py; this service computes embeddings ON the chip per
request, through the dynamic batcher in fitclip_tpu/serving/).

Endpoints:
- POST /embed_text   body {"texts": ["a cat", ...]}
      -> {"embeddings": [[...], ...], "dim": D}
      Each text is tokenized and submitted individually; the batcher
      coalesces concurrent requests into one bucket-padded device call.
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
- EMBED_MAX_BATCH   largest bucket (default 32)
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
                 max_wait_ms: float):
        import jax

        from fitclip_tpu.serving import BatchServer

        self._tokenize = encoder.get_tokenizer()
        context_len = self._tokenize(["warmup"]).shape[-1]
        params = jax.device_put(params)

        @jax.jit
        def encode(ids):
            return encoder.encode_text(params, ids)

        self.server = BatchServer(
            encode, item_shape=(context_len,), dtype=np.int32,
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


_SERVICE: Optional[TextEmbedService] = None
_SERVICE_LOCK = threading.Lock()


def build_service() -> TextEmbedService:
    """Instantiate the encoder named by EMBED_ENCODER and start serving it."""
    import jax

    from fitclip_tpu.cli.main import (DEFAULT_CONFIG_DIR,
                                      _maybe_load_checkpoint,
                                      instantiate_encoder_slot)
    from fitclip_tpu.config_engine import compose

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
    loaded = _maybe_load_checkpoint(loaded,
                                    os.environ.get("EMBED_CHECKPOINT"))
    max_batch = int(os.environ.get("EMBED_MAX_BATCH", "32"))
    buckets = [b for b in (1, 2, 4, 8, 16, 32, 64, 128) if b <= max_batch]
    service = TextEmbedService(
        loaded.encoder, loaded.params, bucket_sizes=buckets,
        max_wait_ms=float(os.environ.get("EMBED_MAX_WAIT_MS", "2")))
    return service.start()


def _ensure_service() -> TextEmbedService:
    global _SERVICE
    with _SERVICE_LOCK:
        if _SERVICE is None:
            _SERVICE = build_service()
    return _SERVICE


def _handle(method: str, path: str, body: bytes) -> Tuple[int, bytes]:
    """Shared request logic for both server surfaces -> (status, JSON)."""
    from fitclip_tpu.serving.batcher import ServerOverloaded

    if path == "/health":
        stats = _ensure_service().server.stats
        return 200, json.dumps({
            "status": "ok", "requests": stats.requests,
            "batches": stats.batches,
            "mean_batch_fill": round(stats.mean_batch_fill, 4)}).encode()
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
        length = int(self.headers.get("Content-Length") or 0)
        body = self.rfile.read(length) if length else b""
        status, payload = _handle(method, self.path, body)
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
                 500: "500 Internal Server Error",
                 503: "503 Service Unavailable"}


def application(environ, start_response) -> List[bytes]:
    """WSGI entry point (gunicorn 'demo.embed_service')."""
    length = int(environ.get("CONTENT_LENGTH") or 0)
    body = environ["wsgi.input"].read(length) if length else b""
    status, payload = _handle(environ.get("REQUEST_METHOD", "GET"),
                              environ.get("PATH_INFO", "/"), body)
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
