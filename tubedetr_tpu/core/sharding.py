"""Mesh-aware activation sharding constraints for model code.

Model modules are mesh-agnostic: batches arrive already placed
(parallel/mesh.py:shard_batch) and GSPMD propagates layouts. That works
everywhere except where two propagation fronts meet with no anchor in
between — the one observed case is the backbone output feeding the
FSDP-sharded ``input_proj`` kernel: the kernel's data-sharded contracting
dim propagates BACKWARD onto the feature map's channel axis, collides with
the frame-sharded layout flowing forward out of the backbone remat, and
GSPMD resolves it with an "involuntary full rematerialization"
(replicate-then-reshard — a full extra copy of the biggest activation over
ICI, MULTICHIP_r03 tail). Pinning the activation at the boundary makes
GSPMD all-gather the small kernel instead, which is the FSDP-correct plan.

The helper is a no-op when no mesh context is active (single-chip tests,
bench, serving) or when the active mesh lacks the named axes, so model code
can call it unconditionally. The reference has no equivalent concern: its
only distribution is DDP over replicated parameters
(/root/reference/util/dist.py:210-247).
"""

from __future__ import annotations

from typing import Optional

import jax
from jax.sharding import PartitionSpec as P


def active_mesh_axis_names() -> Optional[tuple]:
    """Axis names of the mesh context the current trace runs under, or None.

    Covers both context styles: the classic ``with mesh:`` physical-mesh
    context (what parallel/ and the train CLI use) and the newer
    ``jax.set_mesh`` abstract-mesh context.
    """
    try:
        from jax._src.mesh import thread_resources

        pm = thread_resources.env.physical_mesh
        if not pm.empty:
            return tuple(pm.axis_names)
    except Exception:
        pass
    try:
        am = jax.sharding.get_abstract_mesh()
        if not am.empty:
            return tuple(am.axis_names)
    except Exception:
        pass
    return None


def constrain_frame_major(x: jax.Array, axes=("data", "time")) -> jax.Array:
    """Pin dim 0 (the flat frame/batch axis) to the activation layout —
    sharded over ``axes`` in order, all other dims replicated in-spec (free
    for GSPMD where the spec says None). No-op without a matching mesh."""
    names = active_mesh_axis_names()
    if names is None:
        return x
    use = tuple(a for a in axes if a in names)
    if not use:
        return x
    spec = P(use if len(use) > 1 else use[0], *([None] * (x.ndim - 1)))
    return jax.lax.with_sharding_constraint(x, spec)
