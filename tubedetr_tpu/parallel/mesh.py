"""Device mesh and sharding layout for TubeDETR training/inference.

The reference's only distribution strategy is NCCL data parallelism
(SURVEY.md §2.7). The TPU-native layout generalises it to a 2D mesh:

* ``data``: data parallelism over videos (the B axis). Gradients are summed
  by XLA-inserted psums when the loss is written over the global batch.
* ``time``: sequence parallelism over the frame/clip axis — the headline TPU
  feature (SURVEY.md §5.7). Legal because the space-text encoder attends
  within single clips and the decoder cross-attention within single frames;
  only the tiny (<=200 x 200) decoder TSA needs cross-time communication,
  which XLA realises as an all-gather of the (B, T, D) time queries over ICI.

Activations shard as (B -> data, T/Tc -> time); parameters are replicated
(the model is ~180M params — well within one chip's HBM; no FSDP needed,
but see ``shard_opt_state_along_data`` for optional optimizer-state sharding).
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: int = -1, time: int = 1, devices: Optional[list] = None
) -> Mesh:
    """Build a (data, time) mesh. ``data=-1`` uses all remaining devices."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % time == 0, (n, time)
        data = n // time
    assert data * time <= n, f"mesh {data}x{time} needs more than {n} devices"
    arr = np.asarray(devices[: data * time]).reshape(data, time)
    return Mesh(arr, axis_names=("data", "time"))


def batch_pspec(name: str) -> P:
    """PartitionSpec for each batch field."""
    specs = {
        "frames_slow": P("data", "time", None, None, None),
        "slow_pad_mask": P("data", "time", None, None),
        "frames_fast": P("data", "time", None, None, None),
        "fast_pad_mask": P("data", "time", None, None),
        "tokens": P("data", None),
        "text_pad_mask": P("data", None),
        "durations": P("data"),
        "target_boxes": P("data", "time", None),
        "inter_idx": P("data", None),
        "time_mask": P("data", "time"),
    }
    return specs.get(name, P("data"))


def shard_batch(batch: dict, mesh: Mesh) -> dict:
    """Place a host batch onto the mesh. Single-process: device_put with the
    per-field NamedSharding. Multi-process (mesh spans processes): each
    process passes its LOCAL slice of the global batch and the global array
    is assembled process-locally (the per-process DataLoader shard IS the
    local slice — no cross-host data movement)."""
    if jax.process_count() > 1:
        return {
            k: jax.make_array_from_process_local_data(
                NamedSharding(mesh, batch_pspec(k)), np.asarray(v)
            )
            for k, v in batch.items()
        }
    n_data = mesh.shape["data"]
    b = next(iter(batch.values())).shape[0]
    assert b % n_data == 0, (
        f"global batch {b} not divisible by data axis {n_data}; pad the "
        f"batch (DataLoader guarantees this when batch_size % mesh_data == 0)"
    )
    return {
        k: jax.device_put(v, NamedSharding(mesh, batch_pspec(k)))
        for k, v in batch.items()
    }


def replicate(tree: Any, mesh: Mesh) -> Any:
    """Replicate a (host or single-device) tree over the mesh. Multi-process:
    every process holds the same values (same seed / same checkpoint), so the
    host-local -> global conversion with an empty PartitionSpec builds the
    fully-replicated global arrays without any broadcast traffic."""
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        host_tree = jax.tree_util.tree_map(np.asarray, tree)
        pspecs = jax.tree_util.tree_map(lambda _: P(), host_tree)
        return multihost_utils.host_local_array_to_global_array(
            host_tree, mesh, pspecs
        )
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def batch_shardings(mesh: Mesh, batch: dict) -> dict:
    return {k: NamedSharding(mesh, batch_pspec(k)) for k in batch}


def prefetch_to_device(iterator, mesh: Mesh, size: int = 2):
    """Double-buffered host->device feed: keep ``size`` sharded batches in
    flight so the transfer of batch N+1 overlaps the compute of batch N
    (SURVEY.md §7 hard part 3). Yields (device_batch, meta) pairs."""
    import collections

    queue = collections.deque()

    def enqueue(n):
        for _ in range(n):
            try:
                batch, meta = next(iterator)
            except StopIteration:
                return
            queue.append((shard_batch(batch, mesh), meta))

    enqueue(size)
    while queue:
        yield queue.popleft()
        enqueue(1)
