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
