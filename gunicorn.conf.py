"""Production server config for the demo search service (reference
gunicorn.conf.py). demo.app exposes a WSGI ``application``; run with
``CAPTIONS_DIR=... gunicorn`` from the repo root."""
bind = "0.0.0.0:5000"
workers = 2
timeout = 3600
wsgi_app = "demo.app"
