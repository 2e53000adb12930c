"""Multi-host runtime glue: jax.distributed over DCN.

The reference's only cross-machine mechanism is the ggml-rpc TCP backend
(/root/reference/ggml/src/ggml-rpc.cpp) — a client/server that ships
buffers and graphs to one remote executor. Its TPU-native counterpart is
two-layer:

- request-level offload -> runtime/rpc.py (same client/server shape);
- SPMD scale-out -> THIS module: every host runs the same program,
  `jax.distributed.initialize` wires the processes into one runtime over
  DCN, and the existing `parallel.mesh` PartitionSpecs simply see a
  bigger device list (collectives ride ICI within a slice, DCN across).

Nothing else in the framework changes for multi-host: the mesh helpers,
sharding rules, and jitted functions are written against the GLOBAL
device set, which is exactly why this module is thin — that's the design
win over porting the reference's per-backend scheduler.

Single-host runs don't need any of this; `initialize()` is a no-op unless
a coordinator is configured (flags or env).
"""

from __future__ import annotations

import os

import jax
import numpy as np

from qwen2_audio_tpu.utils.logging import log_info

# environment convention (matches jax.distributed's own auto-detection
# names where they exist; QA_* forms are ours)
ENV_COORDINATOR = "QA_COORDINATOR_ADDRESS"
ENV_NUM_PROCESSES = "QA_NUM_PROCESSES"
ENV_PROCESS_ID = "QA_PROCESS_ID"

_initialized = False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None,
               local_device_ids: list[int] | None = None) -> bool:
    """Join the multi-host runtime. Args fall back to QA_* env vars, then
    to jax.distributed's own cluster auto-detection (TPU pods populate
    it from the metadata server). Returns True iff distributed mode is
    active. Idempotent; a no-op single-host when nothing is configured."""
    global _initialized
    if _initialized:
        return True
    coordinator_address = (coordinator_address
                           or os.environ.get(ENV_COORDINATOR))
    if num_processes is None and os.environ.get(ENV_NUM_PROCESSES):
        num_processes = int(os.environ[ENV_NUM_PROCESSES])
    if process_id is None and os.environ.get(ENV_PROCESS_ID):
        process_id = int(os.environ[ENV_PROCESS_ID])

    if coordinator_address is None and num_processes is None:
        return False    # single-host; nothing to do

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids)
    _initialized = True
    log_info("distributed: process %d/%d, %d local + %d global devices\n",
             jax.process_index(), jax.process_count(),
             len(jax.local_devices()), len(jax.devices()))
    return True


def shutdown() -> None:
    global _initialized
    if _initialized:
        jax.distributed.shutdown()
        _initialized = False


def is_distributed() -> bool:
    return jax.process_count() > 1


def global_mesh(tp: int = 1, dp: int | None = None):
    """Mesh over the GLOBAL device set. tp should divide the devices of
    one host/slice so tensor-parallel collectives stay on ICI; dp spans
    hosts over DCN (the scaling-book layout). dp defaults to all
    remaining devices."""
    from qwen2_audio_tpu.parallel.mesh import make_mesh
    n = len(jax.devices())
    if n % tp:
        raise ValueError(f"tp={tp} does not divide {n} global devices")
    if dp is None:
        dp = n // tp
    return make_mesh(dp=dp, tp=tp)


def host_local_batch_to_global(batch: np.ndarray, mesh, spec):
    """Per-host input batch -> one global jax.Array (each host feeds its
    own shard; the standard multi-host data-loading pattern). `spec` is
    the batch PartitionSpec, e.g. P('dp') on axis 0."""
    from jax.sharding import NamedSharding
    return jax.make_array_from_process_local_data(
        NamedSharding(mesh, spec), np.asarray(batch))


def process_allgather(x: np.ndarray) -> np.ndarray:
    """All-gather a small per-process array to every host (≙ the result
    collection the reference's RPC client does with GET_TENSOR). Uses a
    tiny jitted all_gather over a 1-D device mesh."""
    if not is_distributed():
        return np.asarray(x)[None]
    from jax.experimental import multihost_utils
    return np.asarray(multihost_utils.process_allgather(x))
