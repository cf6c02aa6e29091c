"""Online serving: dynamic-batching inference over jitted encode functions.

The reference serves its demo from precomputed embeddings
(/root/reference/demo/app.py); online encoding there would go through
torch's eager per-request path. On TPU, per-request dispatch wastes the
chip — XLA compiles per SHAPE, and a batch-1 call leaves the MXU idle — so
the TPU-native serving shape is a dynamic batcher: requests queue, a
dispatcher thread coalesces them, pads to a static power-of-two bucket
(one compile per bucket, ever), and fans the batched result back out.
"""
from fitclip_tpu.serving.batcher import BatchServer, ServerStats

__all__ = ["BatchServer", "ServerStats"]
