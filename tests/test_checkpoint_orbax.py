"""Orbax directory-checkpoint backend roundtrip (+ load_checkpoint dispatch)."""

import numpy as np

from tubedetr_tpu.train.checkpoint import (
    load_checkpoint,
    save_checkpoint_orbax,
)


def test_orbax_roundtrip(tmp_path):
    params = {"layer": {"kernel": np.arange(6, dtype=np.float32).reshape(2, 3)}}
    buffers = {"bn": {"running_var": np.ones((3,), np.float32)}}
    path = str(tmp_path / "ckpt_dir")
    save_checkpoint_orbax(path, params, buffers, epoch=7, config={"lr": 1e-4})
    out = load_checkpoint(path)  # dispatches on directory
    np.testing.assert_array_equal(
        np.asarray(out["params"]["layer"]["kernel"]), params["layer"]["kernel"]
    )
    np.testing.assert_array_equal(
        np.asarray(out["buffers"]["bn"]["running_var"]),
        buffers["bn"]["running_var"],
    )
    assert out["epoch"] == 7
    assert out["config"]["lr"] == 1e-4


def test_async_writer_snapshot_isolation(tmp_path):
    """AsyncCheckpointWriter.save snapshots synchronously: mutating the
    source tree after save() must not leak into the written file, and the
    background write is joined by wait()."""
    import pytest

    from tubedetr_tpu.train.checkpoint import AsyncCheckpointWriter

    pytest.importorskip("jax")
    w = AsyncCheckpointWriter()
    params = {"w": np.zeros((4,), np.float32)}
    buffers = {"b": np.ones((2,), np.float32)}
    path = str(tmp_path / "async.ckpt")
    w.save(path, params=params, buffers=buffers, epoch=3, config={"x": 1})
    params["w"] += 99.0  # post-save mutation (next donated step, morally)
    w.wait()
    out = load_checkpoint(path)
    np.testing.assert_array_equal(out["params"]["w"], np.zeros((4,)))
    assert out["epoch"] == 3


def test_async_writer_sequencing_and_error_propagation(tmp_path):
    """A second save() joins the first (ordered checkpoints); a failed
    write surfaces on the next wait() instead of dying in the thread."""
    import pytest

    from tubedetr_tpu.train.checkpoint import AsyncCheckpointWriter

    w = AsyncCheckpointWriter()
    path = str(tmp_path / "seq.ckpt")
    for epoch in range(3):  # back-to-back saves exercise the join path
        w.save(path, params={"w": np.full((2,), epoch, np.float32)},
               buffers={}, epoch=epoch, config={})
    w.wait()
    assert load_checkpoint(path)["epoch"] == 2

    blocker = tmp_path / "not_a_dir"
    blocker.write_text("file, not dir")
    w.save(str(blocker / "x.ckpt"), params={}, buffers={}, epoch=0,
           config={})
    with pytest.raises(OSError):
        w.wait()
    # the error is consumed: the writer is reusable afterwards
    w.save(path, params={"w": np.zeros((1,), np.float32)}, buffers={},
           epoch=9, config={})
    w.wait()
    assert load_checkpoint(path)["epoch"] == 9
