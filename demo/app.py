"""Subtitle-search web service (stdlib http.server; the reference's Flask +
gunicorn app, demo/app.py).

GET /search?q=<json token pattern>&top_k=10 -> JSON list of
{"video_id", "start_time", "end_time", "text"} spans, sampled.

Run: CAPTIONS_DIR=/path/to/captions python -m demo.app [port]
"""

import json
import os
import random
import sys
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlparse

from demo.search import load_captions, search_in_subtitles

CAPTIONS = []


class Handler(BaseHTTPRequestHandler):
    def _send_json(self, payload, status=200):
        body = json.dumps(payload).encode()
        self.send_response(status)
        self.send_header("Content-Type", "application/json")
        self.send_header("Access-Control-Allow-Origin", "*")
        self.send_header("Content-Length", str(len(body)))
        self.end_headers()
        self.wfile.write(body)

    def do_GET(self):  # noqa: N802
        parsed = urlparse(self.path)
        if parsed.path == "/search":
            try:
                query = parse_qs(parsed.query)
                pattern = json.loads(query.get("q", ["[]"])[0])
                top_k = int(query.get("top_k", ["10"])[0])
                results = list(search_in_subtitles(CAPTIONS, pattern))
                self._send_json(random.sample(results, min(top_k, len(results))))
            except Exception as error:  # noqa: BLE001
                self._send_json({"status": 500, "message": repr(error)}, status=500)
        elif parsed.path == "/":
            self._send_json({"status": "ok", "captions": len(CAPTIONS),
                             "usage": "/search?q=[{\"LOWER\": \"cat\"}]&top_k=10"})
        else:
            self._send_json({"status": 404}, status=404)

    def log_message(self, *args):
        pass


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
