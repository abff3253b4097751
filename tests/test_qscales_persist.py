"""int8 calibration persistence (VERDICT r2 weak #1 / next-round #1).

The calibrated qscales tree must survive to disk and restore a serving
pipeline with ZERO calibration forwards — the observer-model compile costs
~10 minutes over the remote TPU tunnel, which defeated the compile-once
serving design when paid at every boot. The reference has no quantization
and therefore serves immediately after load
(/root/reference/server_stvg.py:90-140); persistence restores that behavior
for the int8 path.
"""

import numpy as np
import pytest

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.models.quantize import (
    load_qscales,
    qscales_cache_key,
    save_qscales,
)

TINY = dict(
    backbone="resnet14",
    hidden_dim=32,
    nheads=4,
    enc_layers=1,
    dec_layers=1,
    dim_feedforward=64,
    video_max_len=6,
    video_max_len_train=6,
    stride=2,
    resolution=128,
    max_text_len=8,
    text_vocab_size=128,
    text_hidden_size=32,
    text_layers=1,
    text_heads=4,
    text_ffn=64,
    text_max_positions=40,
    fast=True,
    guided_attn=False,
    sted=True,
    aux_loss=False,
    dropout=0.0,
)


@pytest.mark.quick
def test_save_load_roundtrip(tmp_path):
    tree = {
        "backbone": {
            "stem_act_max": np.float32(3.25),
            "layer1_0": {"conv2": {"act_max": np.float32(1.5)},
                         "out_max": np.float32(7.0)},
        },
    }
    path = str(tmp_path / "q.npz")
    save_qscales(path, tree)
    back = load_qscales(path)
    assert float(back["backbone"]["stem_act_max"]) == 3.25
    assert float(back["backbone"]["layer1_0"]["conv2"]["act_max"]) == 1.5
    assert float(back["backbone"]["layer1_0"]["out_max"]) == 7.0


@pytest.mark.quick
def test_cache_key_sensitivity():
    cfg = TubeDETRConfig(backbone_quant="int8_static", **TINY)
    k0 = qscales_cache_key(cfg, "w")
    # stable across identical configs
    assert qscales_cache_key(TubeDETRConfig(backbone_quant="int8_static", **TINY), "w") == k0
    # quantization-relevant fields invalidate
    assert qscales_cache_key(cfg.replace(resolution=224), "w") != k0
    assert qscales_cache_key(cfg.replace(backbone_quant="int8"), "w") != k0
    assert qscales_cache_key(cfg.replace(dilation=True), "w") != k0
    # weights identity invalidates
    assert qscales_cache_key(cfg, "other-weights") != k0
    # irrelevant fields (ports, LRs, output dirs) must NOT invalidate
    assert qscales_cache_key(cfg.replace(port=9999, lr=1e-3, output_dir="x"), "w") == k0
    # calibration-data identity invalidates: scales observed on one val
    # dataset must not silently serve an eval of another (r3 review)
    assert qscales_cache_key(cfg, "w", data_tag="val:vidstg") != k0
    assert qscales_cache_key(cfg, "w", data_tag="val:hcstvg") != \
        qscales_cache_key(cfg, "w", data_tag="val:vidstg")
    # ...but the empty default keeps pre-existing keys (committed bench
    # sidecars stay warm)
    assert qscales_cache_key(cfg, "w", data_tag="") == k0


@pytest.mark.quick
def test_weights_tags_distinguish_init_from_fabricate():
    """A checkpoint-less train-CLI run (model.init weights) and a pipeline
    run (fabricated weights) must not share a sidecar key (r3 review)."""
    from tubedetr_tpu.models.quantize import file_weights_tag, weights_tag_for

    cfg = TubeDETRConfig(backbone_quant="int8_static", **TINY)
    assert weights_tag_for(cfg) == "fabricate-seed0"
    assert weights_tag_for(cfg, default="init-seed42") == "init-seed42"
    assert file_weights_tag("") == ""


@pytest.mark.quick
def test_multi_query_requires_tsa():
    with pytest.raises(ValueError, match="temporal self-attention"):
        TubeDETRConfig(num_queries=2, no_tsa=True, **TINY).validate()
    # the combination each works alone
    TubeDETRConfig(num_queries=2, **TINY).validate()
    TubeDETRConfig(no_tsa=True, **TINY).validate()


@pytest.mark.quick
def test_pipeline_qat_needs_calibration():
    """int8_qat serving must calibrate like int8_static — fake-quant with
    zero-initialized scales is silent garbage (r3 review)."""
    from tubedetr_tpu.apps.pipeline import GroundingPipeline

    cfg = TubeDETRConfig(backbone_quant="int8_qat", qscales_dir="", **TINY)
    pipe = GroundingPipeline(cfg)
    assert pipe._needs_calibration


def _clip(tmp_path):
    rng = np.random.RandomState(1)
    clip = rng.randint(0, 255, (6, 48, 64, 3), dtype=np.uint8)
    vid = str(tmp_path / "clip.npy")
    np.save(vid, clip)
    return vid


def test_pipeline_persists_and_boots_from_sidecar(tmp_path, monkeypatch):
    """First pipeline calibrates + writes the sidecar; a second pipeline with
    the same config boots calibrated and never runs an observer forward."""
    from tubedetr_tpu.apps.pipeline import GroundingPipeline

    vid = _clip(tmp_path)
    qdir = str(tmp_path / "qcache")
    cfg = TubeDETRConfig(
        backbone_quant="int8_static", qscales_dir=qdir, **TINY
    )

    pipe1 = GroundingPipeline(cfg)
    assert pipe1._needs_calibration  # no sidecar yet
    out1 = pipe1.ground(vid, "a red square", out_dir=str(tmp_path / "o1"))
    assert not pipe1._needs_calibration
    import glob
    import os

    sidecars = glob.glob(os.path.join(qdir, "qscales-*.npz"))
    assert len(sidecars) == 1  # persisted

    # poison calibration: the second pipeline must never call it
    import tubedetr_tpu.models.quantize as qz

    def _boom(*a, **k):
        raise AssertionError("calibration ran despite a valid sidecar")

    monkeypatch.setattr(qz, "calibrate_qscales", _boom)
    pipe2 = GroundingPipeline(cfg)
    assert not pipe2._needs_calibration  # booted from the sidecar
    out2 = pipe2.ground(vid, "a red square", out_dir=str(tmp_path / "o2"))
    # identical scales + identical fabricated weights -> identical outputs
    np.testing.assert_allclose(
        np.asarray(out1["boxes"]), np.asarray(out2["boxes"]), atol=1e-5
    )
    assert out1["sted"] == out2["sted"]


def test_calibrate_flag_forces_refresh(tmp_path):
    """--calibrate ignores the sidecar and overwrites it."""
    from tubedetr_tpu.apps.pipeline import GroundingPipeline

    vid = _clip(tmp_path)
    qdir = str(tmp_path / "qcache")
    cfg = TubeDETRConfig(
        backbone_quant="int8_static", qscales_dir=qdir, **TINY
    )
    GroundingPipeline(cfg).ground(vid, "x", render=False,
                                  out_dir=str(tmp_path / "o"))
    import glob
    import os

    (sidecar,) = glob.glob(os.path.join(qdir, "qscales-*.npz"))
    mtime0 = os.stat(sidecar).st_mtime

    pipe = GroundingPipeline(cfg.replace(calibrate=True))
    assert pipe._needs_calibration  # sidecar deliberately ignored
    pipe.ground(vid, "x", render=False, out_dir=str(tmp_path / "o"))
    assert os.stat(sidecar).st_mtime >= mtime0  # refreshed


def test_checkpoint_embeds_qscales(tmp_path):
    """qscales saved into a checkpoint ride along on /reload: the pipeline
    serves the new weights without recalibrating."""
    from tubedetr_tpu.apps.pipeline import GroundingPipeline
    from tubedetr_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    vid = _clip(tmp_path)
    cfg = TubeDETRConfig(backbone_quant="int8_static", **TINY)
    pipe = GroundingPipeline(cfg)
    pipe.ground(vid, "x", render=False, out_dir=str(tmp_path / "o"))
    qscales = pipe.variables["qscales"]

    ck = str(tmp_path / "ck.ckpt")
    save_checkpoint(
        ck,
        params=pipe.variables["params"],
        buffers=pipe.variables.get("buffers", {}),
        qscales=qscales,
    )
    assert load_checkpoint(ck)["qscales"] is not None

    pipe.reload(ck)
    assert not pipe._needs_calibration  # checkpoint carried its scales
    out = pipe.ground(vid, "x", render=False, out_dir=str(tmp_path / "o"))
    assert "sted" in out
