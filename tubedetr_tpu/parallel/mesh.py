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
    data: int = -1, time: int = 1, model: int = 1,
    devices: Optional[list] = None,
) -> Mesh:
    """Build a (data, time[, model]) mesh. ``data=-1`` uses all remaining
    devices. The ``model`` (tensor-parallel) axis is innermost so its
    per-layer collectives ride the fastest ICI links (see parallel/tp.py);
    it is only materialised when ``model > 1`` so 2D callers are
    unaffected."""
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if data == -1:
        assert n % (time * model) == 0, (n, time, model)
        data = n // (time * model)
    need = data * time * model
    assert need <= n, f"mesh {data}x{time}x{model} needs more than {n} devices"
    arr = np.asarray(devices[:need])
    if model > 1:
        return Mesh(
            arr.reshape(data, time, model), axis_names=("data", "time", "model")
        )
    return Mesh(arr.reshape(data, time), axis_names=("data", "time"))


def batch_pspec(name: str) -> P:
    """PartitionSpec for each batch field."""
    specs = {
        "frames_slow": P("data", "time", None, None, None),
        "slow_pad_mask": P("data", "time", None, None),
        "frames_fast": P("data", "time", None, None, None),
        "fast_pad_mask": P("data", "time", None, None),
        "slow_valid_hw": P("data", "time", None),
        "fast_valid_hw": P("data", "time", None),
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


def _data_shard_pspec(shape, n_data: int) -> P:
    """Shard the first axis divisible by the data-axis size (ZeRO-style);
    replicate leaves with no such axis (biases, scalars, step counters)."""
    for i, d in enumerate(shape):
        if d >= n_data and d % n_data == 0:
            return P(*([None] * i + ["data"]))
    return P()


def shard_opt_state_along_data(state: Any, mesh: Mesh,
                               shard_ema: bool = True):
    """ZeRO-1-style optimizer-state sharding over the ``data`` mesh axis.

    The reference replicates the full AdamW state per rank
    (/root/reference/main.py:406-415, DDP). On a TPU mesh the moment trees
    (m, v — 2x params in f32) and optionally the EMA tree have no reason to
    be replicated: each leaf is sharded along its first data-divisible axis,
    cutting per-chip state memory by ~(1 - 1/n_data) for those trees
    (~1.9 GB/chip for the 180M-param model on a v5e-8). Because the
    optimizer update is elementwise per leaf, XLA partitions the update
    compute the same way with ZERO extra collectives for the moments; the
    parameter update ``p + u`` re-gathers u where p stays replicated (one
    all-gather per leaf per step, the classic ZeRO-1 trade).

    Returns ``(sharded_state, sharding_tree)`` — pass the sharding tree as
    ``make_train_step(..., state_shardings=...)`` so the layout is pinned
    across steps (donation keeps it in place).
    """
    n_data = mesh.shape["data"]

    def leaf_sharding(x, sharded: bool) -> NamedSharding:
        spec = (
            _data_shard_pspec(np.shape(x), n_data) if sharded else P()
        )
        return NamedSharding(mesh, spec)

    def tree_shardings(tree, sharded: bool):
        return jax.tree_util.tree_map(
            lambda x: leaf_sharding(x, sharded), tree
        )

    shardings = state.replace(
        step=NamedSharding(mesh, P()),
        params=tree_shardings(state.params, False),
        buffers=tree_shardings(state.buffers, False),
        opt_state=tree_shardings(state.opt_state, True),
        ema_params=(
            tree_shardings(state.ema_params, shard_ema)
            if state.ema_params is not None
            else None
        ),
    )
    return _place_like(state, shardings), shardings


def _place_like(tree: Any, shardings: Any) -> Any:
    """Place every leaf with its sharding; multi-process builds the global
    array from the full host copy via callback (every process holds the
    same full values, so each just contributes its addressable shards)."""
    if jax.process_count() > 1:

        def place(x, s):
            arr = np.asarray(x)
            return jax.make_array_from_callback(
                arr.shape, s, lambda idx: arr[idx]
            )

        return jax.tree_util.tree_map(place, tree, shardings)
    return jax.tree_util.tree_map(
        lambda x, s: jax.device_put(x, s), tree, shardings
    )


def gather_state(state: Any, mesh: Mesh) -> Any:
    """Re-replicate a (possibly sharded) TrainState — used before
    checkpointing / host eval when optimizer-state sharding is on.

    Implemented as a jitted identity with replicated out_shardings so the
    all-gather happens inside XLA — valid in multi-controller runs too
    (a raw cross-process ``device_put`` resharding is not)."""
    repl = NamedSharding(mesh, P())
    return jax.jit(lambda s: s, out_shardings=repl)(state)


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
