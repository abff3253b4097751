"""Sequence(time)-parallel inference: sharding the frame axis over a 4-way
'time' mesh axis must produce numerically identical outputs to a single
device — XLA inserts the TSA all-gather; everything else is local
(SURVEY.md §5.7's headline TPU feature)."""

import numpy as np

import jax
import jax.numpy as jnp

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.data.collate import collate
from tubedetr_tpu.data.synthetic import make_synthetic_batch_samples
from tubedetr_tpu.models.tubedetr import build_model
from tubedetr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from tubedetr_tpu.parallel.train_step import model_inputs


def test_time_sharded_inference_matches_single_device():
    cfg = TubeDETRConfig(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=8,
        video_max_len_train=8,
        stride=2,
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
    model = build_model(cfg)
    samples = make_synthetic_batch_samples(1, t=cfg.video_max_len_train)
    batch, _ = collate(samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len)
    inputs = model_inputs(batch)
    variables = model.init(jax.random.PRNGKey(0), **inputs)

    fwd = jax.jit(lambda v, b: model.apply(v, **b)["pred_boxes"])

    # single device
    single = np.asarray(fwd(variables, inputs))

    # 4-way time sharding: T=8 frames and Tc=4 clips split over the axis
    mesh = make_mesh(data=1, time=4, devices=jax.devices()[:4])
    with mesh:
        vs = replicate(variables, mesh)
        sharded = shard_batch(inputs, mesh)
        out = np.asarray(fwd(vs, sharded))
        # check the inputs really were sharded over 4 devices
        assert len(sharded["frames_fast"].sharding.device_set) == 4

    np.testing.assert_allclose(out, single, atol=2e-5)


def test_time_sharded_int8_inference_matches_single_device():
    """The int8_static backbone (calibrated scales, int8 residual stream)
    under 4-way time sharding stays equivalent to one device. Not bitwise:
    the int8 convs accumulate in exact int32, but the float STEM conv's
    reduction tiling changes with the per-device frame count, and a
    stem output ulp near a quantization boundary flips one int8 step that
    the tiny random transformer then amplifies — so this asserts closeness,
    not equality (the bf16 test above covers tight numeric agreement)."""
    cfg = TubeDETRConfig(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=8,
        video_max_len_train=8,
        stride=2,
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
        backbone_quant="int8_static",
    )
    model = build_model(cfg)
    calib = build_model(cfg.replace(backbone_quant="int8"))
    samples = make_synthetic_batch_samples(1, t=cfg.video_max_len_train)
    batch, _ = collate(samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len)
    inputs = model_inputs(batch)
    variables = model.init(jax.random.PRNGKey(0), **inputs)
    # calibrate on the single device (scales must be identical either way)
    _, upd = calib.apply(variables, **inputs, mutable=["qscales"])
    variables = {**variables, "qscales": upd["qscales"]}

    fwd = jax.jit(lambda v, b: model.apply(v, **b)["pred_boxes"])
    single = np.asarray(fwd(variables, inputs))

    mesh = make_mesh(data=1, time=4, devices=jax.devices()[:4])
    with mesh:
        vs = replicate(variables, mesh)
        sharded = shard_batch(inputs, mesh)
        out = np.asarray(fwd(vs, sharded))
        assert len(sharded["frames_fast"].sharding.device_set) == 4

    assert np.abs(out - single).max() < 0.05, np.abs(out - single).max()
    assert np.abs(out - single).mean() < 5e-3
