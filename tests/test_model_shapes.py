"""Shape and bookkeeping tests for the full TubeDETR forward on a tiny config.

Covers SURVEY.md §7 hard part 4: stride/clip replication over ragged
durations, including the `dur % k != 0` tail-clip case.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.models.tubedetr import build_model

# fast confidence subset for the 1-core box (VERDICT r2 weak #7)
pytestmark = pytest.mark.quick



def tiny_cfg(**kw):
    base = dict(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=2,
        dec_layers=2,
        dim_feedforward=64,
        video_max_len=8,
        video_max_len_train=8,
        stride=3,
        resolution=64,
        max_text_len=6,
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
    )
    base.update(kw)
    return TubeDETRConfig(**base)


def make_batch(cfg, b=2, h=64, w=64, seed=0):
    rng = np.random.RandomState(seed)
    t = cfg.video_max_len_train
    tc = cfg.n_clips
    durations = np.array([t, t - 3])  # ragged: tail clip not full
    batch = dict(
        frames_slow=jnp.asarray(rng.randn(b, tc, h, w, 3).astype(np.float32)),
        slow_pad_mask=jnp.zeros((b, tc, h, w), dtype=bool),
        tokens=jnp.asarray(rng.randint(0, cfg.text_vocab_size, (b, cfg.max_text_len))),
        text_pad_mask=jnp.asarray(
            np.arange(cfg.max_text_len)[None] >= np.array([4, 6])[:, None]
        ),
        durations=jnp.asarray(durations),
        frames_fast=jnp.asarray(rng.randn(b, t, h, w, 3).astype(np.float32)),
        fast_pad_mask=jnp.zeros((b, t, h, w), dtype=bool),
    )
    return batch


@pytest.fixture(scope="module")
def model_and_out():
    cfg = tiny_cfg()
    model = build_model(cfg)
    batch = make_batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), **batch)
    out = model.apply(variables, **batch)
    return cfg, model, variables, batch, out


def test_output_shapes(model_and_out):
    cfg, model, variables, batch, out = model_and_out
    b, t = 2, cfg.video_max_len_train
    hw = 4  # 64/32 = 2 -> 2x2
    s = hw + cfg.max_text_len
    assert out["pred_boxes"].shape == (b, t, 4)
    assert out["pred_sted"].shape == (b, t, 2)
    assert out["weights"].shape == (b, t, t)
    assert out["ca_weights"].shape == (b, t, s)
    assert out["aux_pred_boxes"].shape == (cfg.dec_layers - 1, b, t, 4)
    assert out["aux_pred_sted"].shape == (cfg.dec_layers - 1, b, t, 2)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
    assert (np.asarray(out["pred_boxes"]) >= 0).all()
    assert (np.asarray(out["pred_boxes"]) <= 1).all()


def test_temporal_replication_is_clipwise(model_and_out):
    """Without the fast branch, frames of the same clip see identical memory,
    so their decoder cross-attention outputs must be frame-independent only
    through the time query — check the memory gather directly."""
    cfg, model, variables, batch, out = model_and_out
    from tubedetr_tpu.core.masking import frame_to_clip

    f2c = np.asarray(frame_to_clip(cfg.video_max_len_train, cfg.stride))
    assert f2c.tolist() == [0, 0, 0, 1, 1, 1, 2, 2]


def test_forward_jits_and_is_deterministic(model_and_out):
    cfg, model, variables, batch, out = model_and_out
    fwd = jax.jit(lambda v, b: model.apply(v, **b))
    out1 = fwd(variables, batch)
    out2 = fwd(variables, batch)
    np.testing.assert_allclose(
        np.asarray(out1["pred_boxes"]), np.asarray(out2["pred_boxes"]), atol=0
    )
    np.testing.assert_allclose(
        np.asarray(out1["pred_boxes"]),
        np.asarray(out["pred_boxes"]),
        atol=1e-5,
    )


def test_no_fast_variant():
    cfg = tiny_cfg(fast=False)
    model = build_model(cfg)
    batch = make_batch(cfg)
    batch.pop("frames_fast")
    batch.pop("fast_pad_mask")
    variables = model.init(jax.random.PRNGKey(0), **batch)
    out = model.apply(variables, **batch)
    assert out["pred_boxes"].shape == (2, cfg.video_max_len_train, 4)


@pytest.mark.parametrize("mode", ["gating", "pool", "noslow", "transformer"])
def test_fast_mode_variants(mode):
    cfg = tiny_cfg(fast_mode=mode)
    model = build_model(cfg)
    batch = make_batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), **batch)
    out = model.apply(variables, **batch)
    assert out["pred_boxes"].shape == (2, cfg.video_max_len_train, 4)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_fast_residual_zero_init_matches_slow_only():
    """The default fast branch has a zero-initialised residual projection:
    at init, enabling it must not change the slow-path predictions
    (/root/reference/models/transformer.py:173-174 zero-init semantics)."""
    cfg_fast = tiny_cfg(fast=True, dropout=0.0)
    model_fast = build_model(cfg_fast)
    batch = make_batch(cfg_fast)
    vf = model_fast.init(jax.random.PRNGKey(0), **batch)
    out_fast = model_fast.apply(vf, **batch)
    # zero-init residual: fast_residual contributes exactly zero at init
    fr = vf["params"]["transformer"]["fast_residual"]
    assert float(jnp.abs(fr["kernel"]).max()) == 0.0
    assert float(jnp.abs(fr["bias"]).max()) == 0.0
