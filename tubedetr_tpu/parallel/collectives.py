"""Collective inventory of compiled sharded programs.

The multi-chip path here is compile-validated (one real chip — no wall-clock
ICI measurement is possible), so the honest efficiency statement is a
*communication budget*: which collectives the compiled program actually
contains, over which mesh axes, moving how many bytes per step. This module
extracts that inventory from post-SPMD optimized HLO and classifies each
collective by the mesh axes its replica groups span — turning
"the sharded program compiles" into "the sharded program communicates
exactly what the layout design says it should" (docs/SCALING.md).

The reference has no analogue: its DDP traffic is a fixed bucket all-reduce
stream NCCL reports only at runtime (/root/reference/util/dist.py:210-247).

Used by tests/test_collectives.py (regression-pins the collective set per
mesh leg) and scripts/collective_accounting.py (the budget table).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

_DTYPE_BYTES = {
    "pred": 1, "s8": 1, "u8": 1, "s16": 2, "u16": 2, "f16": 2, "bf16": 2,
    "s32": 4, "u32": 4, "f32": 4, "s64": 8, "u64": 8, "f64": 8,
    "c64": 8, "c128": 16,
}

_KINDS = (
    "all-reduce",
    "all-gather",
    "reduce-scatter",
    "all-to-all",
    "collective-permute",
)

# per-device ICI bytes moved, as a function of (result_bytes, group_size) —
# standard ring-algorithm accounting (each device sends+receives its share)
_ICI_FACTOR = {
    # gathers S shards of size result/S: moves result*(S-1)/S per device
    "all-gather": lambda b, s: b * (s - 1) / s,
    # ring all-reduce = reduce-scatter + all-gather: 2*b*(S-1)/S
    "all-reduce": lambda b, s: 2.0 * b * (s - 1) / s,
    # input is S*result; each device ships (S-1)/S of its input
    "reduce-scatter": lambda b, s: b * (s - 1),
    "all-to-all": lambda b, s: b * (s - 1) / s,
    "collective-permute": lambda b, s: float(b),
}


@dataclass
class Collective:
    name: str
    kind: str
    shapes: List[str]
    result_bytes: int
    n_groups: int
    group_size: int
    axes: Tuple[str, ...]  # mesh axes the replica groups span
    computation: str  # "ENTRY" or the (loop-body/branch) computation name
    ici_bytes: float = 0.0

    def __post_init__(self):
        self.ici_bytes = _ICI_FACTOR[self.kind](
            self.result_bytes, max(self.group_size, 1)
        )


_SHAPE_RE = re.compile(r"\b(pred|[sufc]\d+|bf16)\[([0-9,]*)\]")


def _shape_bytes(type_str: str) -> Tuple[List[str], int]:
    """Total bytes (and the shape strings) of an HLO result type — handles
    tuples like ``(f32[2,4], f32[])``."""
    shapes, total = [], 0
    for dt, dims in _SHAPE_RE.findall(type_str):
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        shapes.append(f"{dt}[{dims}]")
        total += n * _DTYPE_BYTES[dt]
    return shapes, total


def _parse_replica_groups(attr: str) -> np.ndarray:
    """Parse either explicit ``{{0,1},{2,3}}`` or iota
    ``[G,S]<=[d0,d1,...](T(p0,p1,...))?`` replica-group syntax into an
    (n_groups, group_size) array of device ids."""
    attr = attr.strip()
    if attr.startswith("{"):
        groups = [
            [int(x) for x in grp.split(",") if x.strip()]
            for grp in re.findall(r"\{([0-9,\s]*)\}", attr)
        ]
        groups = [g for g in groups if g]
        if not groups:
            return np.zeros((0, 0), np.int64)
        return np.asarray(groups, np.int64)
    m = re.match(
        r"\[(\d+),(\d+)\]<=\[([\d,]+)\](?:T\(([\d,]+)\))?", attr
    )
    if not m:
        raise ValueError(f"unrecognized replica_groups syntax: {attr!r}")
    g, s = int(m.group(1)), int(m.group(2))
    dims = [int(x) for x in m.group(3).split(",")]
    arr = np.arange(int(np.prod(dims)), dtype=np.int64).reshape(dims)
    if m.group(4):
        arr = arr.transpose([int(x) for x in m.group(4).split(",")])
    return arr.reshape(g, s)


def _device_coords(mesh) -> Dict[int, Tuple[int, ...]]:
    """device id -> mesh coordinates."""
    out = {}
    for idx in np.ndindex(mesh.devices.shape):
        out[int(mesh.devices[idx].id)] = idx
    return out


def _classify_axes(groups: np.ndarray, mesh) -> Tuple[str, ...]:
    """Mesh axes along which membership varies within replica groups.

    A collective over ``("time",)`` touches only the time axis' ICI links;
    ``("data", "time")`` spans the whole 2D slice, etc. Groups whose device
    ids are not all in the mesh (shouldn't happen) classify as
    ``("?",)``."""
    coords = _device_coords(mesh)
    varying = set()
    for grp in groups:
        if any(int(d) not in coords for d in grp):
            return ("?",)
        cs = np.asarray([coords[int(d)] for d in grp])
        for ax in range(cs.shape[1]):
            if len(np.unique(cs[:, ax])) > 1:
                varying.add(mesh.axis_names[ax])
    return tuple(a for a in mesh.axis_names if a in varying)


# matches sync opcodes ("all-gather(") and the async "-start" halves
# ("all-gather-start(", which carry the attributes on TPU-compiled HLO);
# the attribute-less "-done" halves don't match and so aren't double-counted
_INSTR_RE = re.compile(
    r"^\s*%?(?P<name>[\w.\-]+)\s*=\s*(?P<type>\([^)]*\)|[^\s]+)\s+"
    r"(?P<kind>" + "|".join(_KINDS) + r")(?:-start)?\("
)
_COMP_RE = re.compile(r"^(ENTRY\s+)?%?(?P<comp>[\w.\-]+)\s*(\([^)]*\))?\s*->")


def parse_collectives(hlo_text: str, mesh) -> List[Collective]:
    """Inventory every collective instruction in optimized HLO text.

    ``computation`` records which HLO computation the instruction lives in
    (``ENTRY`` for straight-line step code; a while-body name means the
    collective runs once per loop trip — e.g. inside a scanned backbone
    stage)."""
    out: List[Collective] = []
    comp = "?"
    for line in hlo_text.splitlines():
        mc = _COMP_RE.match(line)
        if mc and line.rstrip().endswith("{"):
            comp = "ENTRY" if line.startswith("ENTRY") else mc.group("comp")
            continue
        mi = _INSTR_RE.match(line)
        if not mi:
            continue
        rg = re.search(r"replica_groups=(\{\{.*?\}\}|\[[^\]]*\](?:<=\[[^\]]*\])?(?:T\([^)]*\))?)", line)
        if rg is None:
            # collective-permute carries source_target_pairs instead of
            # replica_groups; each {src,dst} pair is one point-to-point hop
            # (classified below like a 2-device group on its mesh axis)
            rg = re.search(r"source_target_pairs=(\{\{.*?\}\})", line)
        groups = (
            _parse_replica_groups(rg.group(1))
            if rg
            else np.zeros((0, 0), np.int64)
        )
        shapes, nbytes = _shape_bytes(mi.group("type"))
        if f"{mi.group('kind')}-start(" in line and len(shapes) > 1:
            # async -start halves type as (operand..., result): count only
            # the result so operand bytes aren't double-counted
            shapes = shapes[-1:]
            _, nbytes = _shape_bytes(shapes[0])
        gsz = int(groups.shape[1]) if groups.size else 1
        if gsz <= 1:
            continue  # degenerate single-device group: no communication
        out.append(
            Collective(
                name=mi.group("name"),
                kind=mi.group("kind"),
                shapes=shapes,
                result_bytes=nbytes,
                n_groups=int(groups.shape[0]),
                group_size=gsz,
                axes=_classify_axes(groups, mesh),
                computation=comp,
            )
        )
    return out


def summarize(colls: Sequence[Collective]) -> Dict[Tuple[str, Tuple[str, ...]], dict]:
    """Aggregate per (kind, axes): count and ICI bytes."""
    agg: Dict[Tuple[str, Tuple[str, ...]], dict] = {}
    for c in colls:
        key = (c.kind, c.axes)
        rec = agg.setdefault(
            key, {"count": 0, "ici_bytes": 0.0, "result_bytes": 0}
        )
        rec["count"] += 1
        rec["ici_bytes"] += c.ici_bytes
        rec["result_bytes"] += c.result_bytes
    return agg


def collective_inventory(compiled, mesh) -> List[Collective]:
    """Inventory a ``jit(...).lower(...).compile()`` executable."""
    return parse_collectives(compiled.as_text(), mesh)
