"""End-to-end training-step tests on the virtual 8-device CPU mesh:
pjit sharding compiles+executes, loss decreases, EMA updates, frozen params
stay frozen (SURVEY.md §4 multi-device simulation strategy)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.data.collate import collate
from tubedetr_tpu.data.synthetic import make_synthetic_batch_samples
from tubedetr_tpu.models.tubedetr import build_model
from tubedetr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from tubedetr_tpu.parallel.train_step import (
    create_train_state,
    make_train_step,
)


def tiny_cfg(**kw):
    base = dict(
        backbone="resnet50",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=2,
        dim_feedforward=64,
        video_max_len=8,
        video_max_len_train=8,
        stride=2,
        max_text_len=8,
        text_vocab_size=128,
        text_hidden_size=32,
        text_layers=2,
        text_heads=4,
        text_ffn=64,
        text_max_positions=40,
        fast=True,
        guided_attn=True,
        sted=True,
        aux_loss=True,
        ema=True,
        dropout=0.0,
    )
    base.update(kw)
    return TubeDETRConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_cfg()
    model = build_model(cfg)
    samples = make_synthetic_batch_samples(4, t=cfg.video_max_len_train)
    batch, meta = collate(
        samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len
    )
    variables = model.init(jax.random.PRNGKey(0), **{
        k: jnp.asarray(v) for k, v in batch.items()
        if k not in ("target_boxes", "inter_idx", "time_mask")
    })
    state, tx, labels = create_train_state(cfg, variables)
    return cfg, model, batch, state, tx, labels


def lrs():
    return {
        "lr": np.float32(1e-3),
        "lr_backbone": np.float32(1e-4),
        "lr_text_encoder": np.float32(1e-3),
    }


def test_train_step_runs_and_loss_decreases(setup):
    cfg, model, batch, state, tx, labels = setup
    mesh = make_mesh(data=4, time=2)
    with mesh:
        st = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        step = make_train_step(cfg, model, tx, labels, donate=False)
        losses = []
        for i in range(8):
            st, metrics = step(st, sharded, lrs(), np.int32(i))
            losses.append(float(metrics["loss_total"]))
    assert all(np.isfinite(losses))
    assert losses[-1] < losses[0], losses
    assert int(st.step) == 8


def test_frozen_params_unchanged_and_ema_moves(setup):
    cfg, model, batch, state, tx, labels = setup
    mesh = make_mesh(data=8, time=1)
    with mesh:
        st = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        step = make_train_step(cfg, model, tx, labels, donate=False)
        st2, _ = step(st, sharded, lrs(), np.int32(0))

    # stem conv frozen (always), layer2 trains
    before = np.asarray(state.params["backbone"]["conv1"]["kernel"])
    after = np.asarray(st2.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(before, after)
    l2b = np.asarray(state.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    l2a = np.asarray(st2.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    assert np.abs(l2a - l2b).max() > 0

    # EMA: moved toward new params but not equal to them
    ema_a = np.asarray(st2.ema_params["transformer"]["decoder"]["layer_0"]["linear1"]["kernel"])
    p_b = np.asarray(state.params["transformer"]["decoder"]["layer_0"]["linear1"]["kernel"])
    p_a = np.asarray(st2.params["transformer"]["decoder"]["layer_0"]["linear1"]["kernel"])
    assert np.abs(ema_a - p_b).max() > 0  # moved
    expected = p_b * cfg.ema_decay + (1 - cfg.ema_decay) * p_a
    np.testing.assert_allclose(ema_a, expected, atol=1e-7)


def test_grad_clip_applied(setup):
    cfg, model, batch, state, tx, labels = setup
    mesh = make_mesh(data=1, time=1, devices=jax.devices()[:1])
    with mesh:
        st = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        step = make_train_step(cfg, model, tx, labels, donate=False)
        _, metrics = step(st, sharded, lrs(), np.int32(0))
    assert np.isfinite(float(metrics["grad_norm"]))


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)
