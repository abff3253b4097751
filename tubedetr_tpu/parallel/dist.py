"""Multi-process runtime: launch-time init, rank helpers, host-side
reductions, print suppression.

Equivalent of /root/reference/util/dist.py:

* ``init_distributed_mode`` (dist.py:210-247): self-configures from env —
  explicit coordinator env vars, or SLURM auto-detection (JAX's own cluster
  detection handles SLURM/OpenMPI), or a no-op single-process fallback.
  NCCL process groups become the JAX coordination service + XLA collectives
  over ICI/DCN.
* ``setup_print_for_distributed`` (dist.py:125-138): non-master ranks print
  only when ``force=True``.
* the reference's ``reduce_dict``/meter reductions (util/dist.py:98-122,
  util/metrics.py:33-45) are realised by ``sync_meters_between_processes``:
  host-side (count, total) all-reduce via ``multihost_utils
  .process_allgather`` at epoch end (per-step host reductions would stall
  the step pipeline over DCN for log-only data).

Launch (two processes, one per host):

    JAX_COORDINATOR_ADDRESS=host0:1234 JAX_NUM_PROCESSES=2 \\
        JAX_PROCESS_ID=0 python -m tubedetr_tpu.apps.train ...

or under SLURM just ``srun python -m tubedetr_tpu.apps.train ...``.
"""

from __future__ import annotations

import builtins
import os
from typing import Dict, Optional

_print_orig = builtins.print


def init_distributed_mode(cfg=None) -> bool:
    """Initialize the JAX distributed runtime from the environment.

    Returns True when a multi-process runtime was initialized. No-op (False)
    when no launcher environment is present — single-process runs stay
    untouched, mirroring the reference's world_size==1 degradation
    (/root/reference/util/dist.py:218-223).
    """
    import jax

    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or os.environ.get(
        "COORDINATOR_ADDRESS"
    )
    nproc = os.environ.get("JAX_NUM_PROCESSES") or os.environ.get(
        "NUM_PROCESSES"
    )
    pid = os.environ.get("JAX_PROCESS_ID") or os.environ.get("PROCESS_ID")
    if coord and nproc is not None and pid is not None:
        jax.distributed.initialize(
            coordinator_address=coord,
            num_processes=int(nproc),
            process_id=int(pid),
        )
        _warmup_collective_context()
        return True
    if "SLURM_PROCID" in os.environ and int(
        os.environ.get("SLURM_NTASKS", "1")
    ) > 1:
        # JAX's cluster auto-detection derives coordinator/rank from SLURM
        # (the reference expands the hostlist by hand, util/dist.py:224-235)
        jax.distributed.initialize()
        _warmup_collective_context()
        return True
    return False


def _warmup_collective_context() -> None:
    """Establish the backend collective context (gloo clique on CPU) while
    the ranks are tightly aligned.

    The context is created lazily on the FIRST cross-process collective and
    its key-exchange has a hard ~30 s deadline; if that first collective
    sits inside a big program (the train step's gradient psum), per-rank
    compile/execution skew — minutes on loaded hosts — blows it. A tiny
    all-reduce over all devices right after a coordination-service barrier
    creates the clique context up front; every later program reuses it.
    """
    import jax
    import numpy as np
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    barrier("collective_warmup")
    devices = jax.devices()
    mesh = Mesh(np.asarray(devices), ("all",))
    n = len(devices)
    x = jax.make_array_from_process_local_data(
        NamedSharding(mesh, P("all")),
        np.ones((n // jax.process_count(),), np.float32),
    )
    total = float(
        jax.jit(
            lambda v: v.sum(), out_shardings=NamedSharding(mesh, P())
        )(x)
    )
    assert total == float(n), (total, n)


def is_dist_initialized() -> bool:
    import jax

    return jax.process_count() > 1


def get_rank() -> int:
    import jax

    return jax.process_index()


def is_main_process() -> bool:
    return get_rank() == 0


def setup_print_for_distributed(is_master: bool) -> None:
    """Suppress printing on non-master ranks unless ``force=True`` is passed
    (/root/reference/util/dist.py:125-138)."""

    def print_maybe(*args, **kwargs):
        force = kwargs.pop("force", False)
        if is_master or force:
            _print_orig(*args, **kwargs)

    builtins.print = print_maybe


def restore_print() -> None:
    builtins.print = _print_orig


_barrier_seq = [0]


def barrier(name: str = "barrier", timeout_ms: int = 1_200_000) -> None:
    """Align all processes via the coordination service (NOT a device
    collective): device-collective backends (gloo on CPU, ICI/DCN on TPU)
    time out in ~30 s while per-process compile skew can be minutes — every
    first collective after independent work must be preceded by this."""
    import jax

    if jax.process_count() <= 1:
        return
    _barrier_seq[0] += 1
    try:
        from jax._src import distributed

        client = distributed.global_state.client
        if client is not None:
            client.wait_at_barrier(
                f"{name}_{_barrier_seq[0]}", timeout_in_ms=timeout_ms
            )
            return
    except Exception:
        pass
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def sync_meters_between_processes(meters: Dict) -> None:
    """All-reduce every SmoothedValue's (count, total) in place
    (/root/reference/util/metrics.py:33-45)."""
    import jax

    if jax.process_count() == 1 or not meters:
        return
    import numpy as np
    from jax.experimental import multihost_utils

    barrier("sync_meters")
    keys = sorted(meters.keys())
    local = np.asarray(
        [[meters[k].count, meters[k].total] for k in keys], np.float64
    )
    summed = np.asarray(multihost_utils.process_allgather(local)).sum(axis=0)
    for k, (count, total) in zip(keys, summed):
        meters[k].count = int(count)
        meters[k].total = float(total)


def local_mesh_devices() -> Optional[list]:
    """Per-process (addressable) devices — for host-local meshes in eval
    paths where each process works on its own data shard."""
    import jax

    return jax.local_devices()
