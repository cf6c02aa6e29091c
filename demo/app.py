"""Subtitle-search web service (the reference's Flask + gunicorn app +
Material-UI frontend, demo/app.py + demo/static/*).

Endpoints:
- GET /                      -> the search frontend (demo/static/index.html)
- GET /static/<path>         -> frontend assets
- GET /health                -> JSON status
- GET /search?q=<json token pattern>&top_k=10
      -> JSON list of {"video_id", "start_time", "end_time", "text"} spans,
         sampled (reference demo/app.py semantics)

Two server surfaces:
- stdlib: ``CAPTIONS_DIR=/path/to/captions python -m demo.app [port]``
- WSGI:   ``gunicorn`` with the repo-root ``gunicorn.conf.py``
          (``wsgi_app = "demo.app"`` — the module-level ``application``).
"""

import json
import mimetypes
import os
import random
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import List, Optional, Tuple
from urllib.parse import parse_qs, urlparse

from demo.search import load_captions, search_in_subtitles

STATIC_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "static")

CAPTIONS = []


def _ensure_captions() -> None:
    global CAPTIONS
    if not CAPTIONS:
        captions_dir = os.environ.get("CAPTIONS_DIR")
        if captions_dir:
            CAPTIONS = load_captions(captions_dir)


def _static_file(relative: str) -> Optional[Tuple[bytes, str]]:
    """Resolve a path under static/ (traversal-safe); None if absent."""
    path = os.path.normpath(os.path.join(STATIC_DIR, relative.lstrip("/")))
    if not path.startswith(STATIC_DIR) or not os.path.isfile(path):
        return None
    content_type = mimetypes.guess_type(path)[0] or "application/octet-stream"
    with open(path, "rb") as file:
        return file.read(), content_type


def _handle(path: str, query_string: str) -> Tuple[int, bytes, str]:
    """Shared request logic for both server surfaces.
    Returns (status, body, content_type)."""
    if path == "/search":
        try:
            query = parse_qs(query_string)
            pattern = json.loads(query.get("q", ["[]"])[0])
            top_k = int(query.get("top_k", ["10"])[0])
            results = list(search_in_subtitles(CAPTIONS, pattern))
            payload = random.sample(results, min(top_k, len(results)))
            return 200, json.dumps(payload).encode(), "application/json"
        except Exception as error:  # noqa: BLE001 - surfaced to the client
            body = json.dumps({"status": 500, "message": repr(error)}).encode()
            return 500, body, "application/json"
    if path == "/health":
        body = json.dumps({"status": "ok", "captions": len(CAPTIONS),
                           "usage": "/search?q=[{\"LOWER\": \"cat\"}]&top_k=10"}).encode()
        return 200, body, "application/json"
    if path == "/":
        path = "/index.html"
    relative = path[len("/static"):] if path.startswith("/static/") else path
    static = _static_file(relative)
    if static is not None:
        body, content_type = static
        return 200, body, content_type
    return 404, json.dumps({"status": 404}).encode(), "application/json"


class Handler(BaseHTTPRequestHandler):
    def _respond(self, include_body: bool) -> None:
        parsed = urlparse(self.path)
        status, body, content_type = _handle(parsed.path, parsed.query)
        self.send_response(status)
        self.send_header("Content-Type", content_type)
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        if include_body:
            self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        self._respond(include_body=True)

    def do_HEAD(self):  # noqa: N802
        self._respond(include_body=False)

    def log_message(self, *args):
        pass


_STATUS_LINES = {200: "200 OK", 404: "404 Not Found",
                 500: "500 Internal Server Error"}


def application(environ, start_response) -> List[bytes]:
    """WSGI entry point (gunicorn.conf.py: wsgi_app = "demo.app")."""
    _ensure_captions()
    status, body, content_type = _handle(environ.get("PATH_INFO", "/"),
                                         environ.get("QUERY_STRING", ""))
    start_response(_STATUS_LINES.get(status, f"{status} "), [
        ("Content-Type", content_type),
        ("Access-Control-Allow-Origin", "*"),
        ("Content-Length", str(len(body))),
    ])
    return [body]


def main() -> None:
    global CAPTIONS
    captions_dir = os.environ.get("CAPTIONS_DIR")
    if not captions_dir:
        raise SystemExit("Set CAPTIONS_DIR to the caption JSONs directory")
    CAPTIONS = load_captions(captions_dir)
    port = int(sys.argv[1]) if len(sys.argv) > 1 else 8080
    print(f"Serving {len(CAPTIONS)} caption docs on :{port}")
    ThreadingHTTPServer(("0.0.0.0", port), Handler).serve_forever()


if __name__ == "__main__":
    main()
