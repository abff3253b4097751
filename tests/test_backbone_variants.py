"""GroupNorm backbone, DC5 dilation, learned position embedding variants."""

import numpy as np

import jax
import jax.numpy as jnp

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.models.resnet import ResNet
from tubedetr_tpu.models.tubedetr import build_model


def test_gn_backbone_params_and_forward():
    m = ResNet(arch="resnet14-gn")
    x = jnp.zeros((1, 64, 64, 3))
    vs = m.init(jax.random.PRNGKey(0), x)
    # GroupNorm scale/bias are trainable params; no FrozenBN buffers
    assert "buffers" not in vs
    assert "scale" in vs["params"]["bn1"]
    out = m.apply(vs, x)
    assert out.shape == (1, 2, 2, 2048)


def test_dc5_dilation_keeps_stride16():
    m = ResNet(arch="resnet14", dilation=True)
    x = jnp.zeros((1, 64, 64, 3))
    vs = m.init(jax.random.PRNGKey(0), x)
    out = m.apply(vs, x)
    assert out.shape == (1, 4, 4, 2048)  # stride 16 instead of 32
    assert ResNet.feature_hw(64, 64, dilation=True) == (4, 4)
    assert ResNet.feature_hw(224, 224) == (7, 7)
    assert ResNet.feature_hw(352, 352) == (11, 11)


def test_learned_position_embedding_model():
    cfg = TubeDETRConfig(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=4,
        video_max_len_train=4,
        stride=2,
        max_text_len=4,
        text_vocab_size=64,
        text_hidden_size=32,
        text_layers=1,
        text_heads=4,
        text_ffn=64,
        text_max_positions=40,
        position_embedding="learned",
        learn_time_embed=True,
        fast=False,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        dropout=0.0,
    )
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    batch = dict(
        frames_slow=jnp.asarray(rng.randn(1, 2, 32, 32, 3).astype(np.float32)),
        slow_pad_mask=jnp.zeros((1, 2, 32, 32), bool),
        tokens=jnp.asarray(rng.randint(2, 64, (1, 4))),
        text_pad_mask=jnp.zeros((1, 4), bool),
        durations=jnp.asarray([4]),
    )
    vs = model.init(jax.random.PRNGKey(0), **batch)
    assert "row_embed" in vs["params"] and "col_embed" in vs["params"]
    assert "time_embed" in vs["params"]["transformer"]
    out = model.apply(vs, **batch)
    assert out["pred_boxes"].shape == (1, 4, 4)
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()


def test_no_tsa_and_no_time_embed_variant():
    cfg = TubeDETRConfig(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=4,
        video_max_len_train=4,
        stride=2,
        max_text_len=4,
        text_vocab_size=64,
        text_hidden_size=32,
        text_layers=1,
        text_heads=4,
        text_ffn=64,
        text_max_positions=40,
        no_tsa=True,
        no_time_embed=True,
        fast=False,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        dropout=0.0,
    )
    model = build_model(cfg)
    rng = np.random.RandomState(0)
    batch = dict(
        frames_slow=jnp.asarray(rng.randn(1, 2, 32, 32, 3).astype(np.float32)),
        slow_pad_mask=jnp.zeros((1, 2, 32, 32), bool),
        tokens=jnp.asarray(rng.randint(2, 64, (1, 4))),
        text_pad_mask=jnp.zeros((1, 4), bool),
        durations=jnp.asarray([4]),
    )
    vs = model.init(jax.random.PRNGKey(0), **batch)
    out = model.apply(vs, **batch)
    assert out["pred_boxes"].shape == (1, 4, 4)
    # no_tsa: TSA weights collapse to self-only attention (shape (B,T,1))
    assert out["weights"].shape[-1] == 1
    assert np.isfinite(np.asarray(out["pred_boxes"])).all()
