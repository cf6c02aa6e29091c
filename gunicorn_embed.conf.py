"""Production server config for the online embedding service.

Run from the repo root:
    EMBED_ENCODER=clip_vit_b_16 gunicorn -c gunicorn_embed.conf.py

ONE sync worker, many threads: the worker owns the chip (a second process
would fight over the device), threads share the dynamic batcher — that is
what coalesces concurrent requests into full device batches. Scale-out is
more hosts/chips behind a load balancer, not more workers here.
preload_app keeps the fork-after-jax-init hazard out entirely.
"""
bind = "0.0.0.0:8081"
workers = 1
threads = 64
timeout = 3600
preload_app = True
wsgi_app = "demo.embed_service"
