#!/usr/bin/env python
"""Served eval throughput: concurrent clients through the dynamic batcher
(fitclip_tpu/serving) over the int8 whole-layer megakernel ViT-B/16 — the
online-serving counterpart of bench.py's offline number.

Measured end-to-end: submit -> coalesce -> bucket-pad -> device call -> ONE
whole-batch host fetch -> future fan-out. Every request's clip is uniquely
perturbed so the async relay cannot dedup identical dispatches. Wall-clock
over all requests is the throughput; per-request latency is reported at
p50/p95 (NOTE: on the tunneled chip a host fetch costs ~1 s, so latency
here is relay-bound — the throughput and fill-rate numbers are the
design-relevant ones).

Env: BENCH_CLIENTS (default 64), BENCH_REQUESTS total (default 512),
BENCH_BUCKET (default 32 — single bucket, one remote Pallas compile),
BENCH_WAIT_MS (default 5), BENCH_FETCH_WORKERS (default 2).
"""
import json
import os
import sys
import threading
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from fitclip_tpu.models.clip import CLIPConfig
    from fitclip_tpu.models.clip.encoder import ClipVideoTextEncoder
    from fitclip_tpu.models.clip.model import fold_pixel_normalization
    from fitclip_tpu.ops.quant import quantize_clip_params
    from fitclip_tpu.serving import BatchServer

    clients = int(os.environ.get("BENCH_CLIENTS", "64"))
    total = int(os.environ.get("BENCH_REQUESTS", "512"))
    bucket = int(os.environ.get("BENCH_BUCKET", "32"))
    wait_ms = float(os.environ.get("BENCH_WAIT_MS", "5"))

    encoder = ClipVideoTextEncoder(CLIPConfig.vit_b_16(), num_frames=4,
                                   dtype=jnp.bfloat16, fused_attention=True,
                                   pixel_normalization_folded=True,
                                   quantized=True)
    params = ClipVideoTextEncoder(
        CLIPConfig.vit_b_16(), num_frames=4,
        dtype=jnp.bfloat16).init_params(jax.random.PRNGKey(0))
    params = fold_pixel_normalization(params, encoder.preprocess.mean,
                                      encoder.preprocess.std)
    rng = np.random.default_rng(0)
    calib_video = jnp.asarray(rng.integers(
        0, 256, size=(8, 4, 224, 224, 3), dtype=np.uint8))
    calib_text = jnp.asarray(
        rng.integers(1, 49408, size=(32, 77)).astype(np.int32))
    qparams = encoder.calibrate(quantize_clip_params(params),
                                calib_video, calib_text)
    qparams = jax.device_put(qparams)

    encode_jit = jax.jit(encoder.encode_video)
    server = BatchServer(lambda v: encode_jit(qparams, v),
                         item_shape=(4, 224, 224, 3), dtype=np.uint8,
                         bucket_sizes=(bucket,), max_wait_ms=wait_ms,
                         queue_size=4 * total,
                         fetch_workers=int(
                             os.environ.get("BENCH_FETCH_WORKERS", "2")))
    server.start()  # one bucket -> one (slow, remote) Pallas warmup compile

    base = rng.integers(0, 250, size=(4, 224, 224, 3), dtype=np.uint8)
    latencies = []
    lat_lock = threading.Lock()
    counter = iter(range(total))
    counter_lock = threading.Lock()

    def client() -> None:
        while True:
            with counter_lock:
                i = next(counter, None)
            if i is None:
                return
            clip = base.copy()
            clip[0, 0, 0, 0] = i % 251  # unique per request: defeats dedup
            clip[0, 0, 1, 0] = (i // 251) % 251
            t0 = time.monotonic()
            server.submit(clip).result(timeout=600)
            with lat_lock:
                latencies.append(time.monotonic() - t0)

    threads = [threading.Thread(target=client) for _ in range(clients)]
    t_start = time.monotonic()
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    wall = time.monotonic() - t_start
    server.stop()

    lat_ms = np.sort(np.asarray(latencies)) * 1e3
    print(json.dumps({
        "metric": "served_eval_throughput",
        "value": round(total / wall, 1),
        "unit": "clips/sec/chip",
        "clients": clients, "requests": total, "bucket": bucket,
        "mean_batch_fill": round(server.stats.mean_batch_fill, 4),
        "batches": server.stats.batches,
        "latency_p50_ms": round(float(lat_ms[len(lat_ms) // 2]), 1),
        "latency_p95_ms": round(float(lat_ms[int(len(lat_ms) * 0.95)]), 1),
    }))


if __name__ == "__main__":
    main()
