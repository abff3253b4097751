"""The shared-backbone inference path (slow tokens gathered from the fast
stream) must be numerically identical to the two-pass path when the slow
frames are the stride-k subsample of the fast frames."""

import numpy as np

import jax
import jax.numpy as jnp

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.models.tubedetr import build_model


def test_share_path_matches_two_pass():
    cfg = TubeDETRConfig(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=6,
        video_max_len_train=6,
        stride=2,
        max_text_len=6,
        text_vocab_size=64,
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
    rng = np.random.RandomState(0)
    b, t, h, w = 1, 6, 32, 32
    tc = cfg.n_clips
    fast = rng.randn(b, t, h, w, 3).astype(np.float32)
    batch = dict(
        frames_slow=jnp.asarray(fast[:, :: cfg.stride]),
        slow_pad_mask=jnp.zeros((b, tc, h, w), bool),
        tokens=jnp.asarray(rng.randint(2, 64, (b, cfg.max_text_len))),
        text_pad_mask=jnp.zeros((b, cfg.max_text_len), bool),
        durations=jnp.asarray(np.array([t])),
        frames_fast=jnp.asarray(fast),
        fast_pad_mask=jnp.zeros((b, t, h, w), bool),
    )
    variables = model.init(jax.random.PRNGKey(0), **batch)

    # share flag on -> single backbone pass; off -> reference two-pass path.
    # Same params, both deterministic.
    model_two = build_model(cfg.replace(share_backbone_inference=False))
    out_shared = model.apply(variables, **batch, deterministic=True)
    out_two = model_two.apply(variables, **batch, deterministic=True)
    np.testing.assert_allclose(
        np.asarray(out_shared["pred_boxes"]),
        np.asarray(out_two["pred_boxes"]),
        atol=2e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_shared["pred_sted"]),
        np.asarray(out_two["pred_sted"]),
        atol=2e-4,
    )
