"""Collective-set regression tests (VERDICT r3 #4).

One real chip means multi-chip efficiency can't be wall-clocked, so these
tests pin the next-strongest property: the *communication structure* of the
compiled sharded programs — which collective kinds over which mesh axes each
leg contains. A layout regression (an FSDP spec change reintroducing the
replicate-then-reshard pathology, a new collective crossing ``data`` in
inference, a loop-body collective multiplying per-trip) changes this
inventory long before it could show up as wall-clock on real ICI.

The reference has no static analogue — its DDP bucket traffic exists only
at runtime inside NCCL (/root/reference/util/dist.py:210-247).
"""

import importlib.util
import os

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_cache = {}


def _leg(name: str):
    """Compile a mesh leg once per test session (compiles are the cost)."""
    if name not in _cache:
        spec = importlib.util.spec_from_file_location(
            "collective_accounting",
            os.path.join(REPO, "scripts", "collective_accounting.py"),
        )
        acc = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(acc)
        _cache[name] = acc.run_leg(name, "tiny")
    return _cache[name]


def test_inference_collectives_cross_time_only():
    """SURVEY §5.7: sharded inference's only cross-device traffic is the
    decoder's temporal self-attention over the ``time`` axis (the encoder
    attends within clips, the cross-attention is time-aligned, parameters
    are replicated). Nothing may cross ``data`` — videos are independent."""
    cols, summary = _leg("infer (4x2)")
    assert cols, "sharded inference compiled with zero collectives?"
    for c in cols:
        assert c.axes == ("time",), (
            f"inference collective crosses non-time axes: {c}"
        )
        assert c.computation == "ENTRY", (
            f"collective inside a loop body (per-trip traffic): {c}"
        )
        assert c.kind in ("all-gather", "all-reduce"), c
    assert any(c.kind == "all-gather" for c in cols), (
        "the TSA time-gather disappeared — decoder layout changed"
    )
    # cross-time traffic is a few KB at the tiny config; a blow-up here
    # means an activation started resharding per step
    total = sum(c.ici_bytes for c in cols)
    assert total < 64 * 1024, f"inference ICI traffic exploded: {total} B"


def test_train_zero1_collective_set():
    """ZeRO-1 training on (data x time): gradient psums over the batch axes
    + one p+u all-gather per sharded leaf over ``data`` (the ZeRO-1 trade,
    docs/SCALING.md). No all-to-alls, no permutes, nothing unclassifiable,
    nothing inside loop bodies."""
    cols, summary = _leg("train zero1 (4x2)")
    kinds_axes = set(summary)
    assert ("all-reduce", ("data",)) in kinds_axes, (
        f"gradient psum over data missing: {sorted(kinds_axes)}"
    )
    assert ("all-gather", ("data",)) in kinds_axes, (
        f"ZeRO-1 update all-gather over data missing: {sorted(kinds_axes)}"
    )
    for c in cols:
        # sub-KB s32 collective-permutes are GSPMD index bookkeeping
        # (visible since the parser learned source_target_pairs); anything
        # bigger would be a real activation/weight reshard and must fail
        if c.kind == "collective-permute":
            assert c.result_bytes <= 1024, f"non-trivial reshard: {c}"
            continue
        assert c.kind in ("all-reduce", "all-gather"), (
            f"unexpected collective kind in ZeRO-1 training: {c}"
        )
        assert "?" not in c.axes, f"unclassifiable replica groups: {c}"
        assert c.computation == "ENTRY", f"loop-body collective: {c}"


def test_train_tp_fsdp_collective_set():
    """TP+FSDP on (2x2x2): Megatron row-parallel psums over ``model`` and
    FSDP weight gathers over ``data`` must both be present; everything
    classifiable; nothing inside loop bodies."""
    cols, summary = _leg("train tp+fsdp (2x2x2)")
    kinds_axes = set(summary)
    assert ("all-reduce", ("model",)) in kinds_axes, (
        f"row-parallel psums over model missing: {sorted(kinds_axes)}"
    )
    assert ("all-gather", ("data",)) in kinds_axes, (
        f"FSDP weight gathers over data missing: {sorted(kinds_axes)}"
    )
    for c in cols:
        assert "?" not in c.axes, f"unclassifiable replica groups: {c}"
        assert c.computation == "ENTRY", f"loop-body collective: {c}"


@pytest.mark.quick
def test_parser_handles_async_start_done_pairs():
    """TPU-compiled HLO splits collectives into -start/-done halves: the
    -start carries the attributes and types as (operand, result) — only the
    result counts; the -done must not be double-counted."""
    import numpy as np

    from tubedetr_tpu.parallel.collectives import parse_collectives

    class _Dev:
        def __init__(self, i):
            self.id = i

    class _Mesh:
        axis_names = ("data", "time")
        devices = np.array([[_Dev(0), _Dev(1)], [_Dev(2), _Dev(3)]])

    hlo = """
ENTRY %main (p: f32[8]) -> f32[8] {
  %ag = (f32[2,16]{0,1}, f32[4,16]{0,1}) all-gather-start(%copy), channel_id=3, replica_groups={{0,2},{1,3}}, dimensions={0}
  %agd = f32[4,16]{0,1} all-gather-done(%ag)
  %ar = f32[8]{0} all-reduce(%x), channel_id=1, replica_groups={{0,1},{2,3}}
}
"""
    cols = parse_collectives(hlo, _Mesh())
    assert [c.kind for c in cols] == ["all-gather", "all-reduce"]
    assert cols[0].result_bytes == 4 * 16 * 4  # result half only
    assert cols[0].axes == ("data",)
    assert cols[1].axes == ("time",)


@pytest.mark.quick
def test_parser_handles_both_replica_group_syntaxes():
    import numpy as np

    from tubedetr_tpu.parallel.collectives import _parse_replica_groups

    g1 = _parse_replica_groups("{{0,4},{1,5},{2,6},{3,7}}")
    assert g1.tolist() == [[0, 4], [1, 5], [2, 6], [3, 7]]
    g2 = _parse_replica_groups("[4,2]<=[8]")
    assert g2.tolist() == [[0, 1], [2, 3], [4, 5], [6, 7]]
    g3 = _parse_replica_groups("[2,4]<=[4,2]T(1,0)")
    assert g3.tolist() == [[0, 2, 4, 6], [1, 3, 5, 7]]
