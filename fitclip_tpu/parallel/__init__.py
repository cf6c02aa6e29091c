from fitclip_tpu.parallel.mesh import (
    create_mesh, replicated, shard_batch, sharded_along, DATA_AXIS)

__all__ = ["create_mesh", "replicated", "shard_batch", "sharded_along", "DATA_AXIS"]
