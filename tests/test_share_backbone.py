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

    # share flag on -> single backbone pass; off -> reference two-pass path
    # (train-share off too: the fully independent two-pass program).
    # Same params, both deterministic.
    model_two = build_model(
        cfg.replace(
            share_backbone_inference=False, share_backbone_train=False
        )
    )
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


def _cfg(**over):
    base = dict(
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
        share_backbone_inference=False,  # force the two-pass branch
    )
    base.update(over)
    return TubeDETRConfig(**base)


def _batch(cfg, seed=0):
    rng = np.random.RandomState(seed)
    b, t, h, w = 1, cfg.video_max_len_train, 32, 32
    tc = cfg.n_clips
    fast = rng.randn(b, t, h, w, 3).astype(np.float32)
    return dict(
        frames_slow=jnp.asarray(fast[:, :: cfg.stride]),
        slow_pad_mask=jnp.zeros((b, tc, h, w), bool),
        tokens=jnp.asarray(rng.randint(2, 64, (b, cfg.max_text_len))),
        text_pad_mask=jnp.zeros((b, cfg.max_text_len), bool),
        durations=jnp.asarray(np.array([t])),
        frames_fast=jnp.asarray(fast),
        fast_pad_mask=jnp.zeros((b, t, h, w), bool),
    )


def _forward_and_grads(cfg, variables, batch):
    model = build_model(cfg)

    def loss(params):
        out = model.apply(
            {**variables, "params": params}, **batch, deterministic=True
        )
        return (
            jnp.sum(out["pred_boxes"] ** 2)
            + jnp.sum(out["pred_sted"] ** 2) * 1e-3
        )

    out = model.apply(variables, **batch, deterministic=True)
    grads = jax.grad(loss)(variables["params"])
    return out, grads


def _assert_share_train_exact(stride, vml):
    """share_backbone_train reuses stop_gradient(slow feats) for the
    every-k-th fast frames — for the float path this must be numerically
    equivalent to the independent full fast pass: identical forward AND
    identical gradients (in particular, the backbone gradient comes from
    the slow pass alone either way)."""
    cfg = _cfg(stride=stride, video_max_len=vml, video_max_len_train=vml)
    batch = _batch(cfg)
    model = build_model(cfg.replace(share_backbone_train=False))
    variables = model.init(jax.random.PRNGKey(0), **batch)

    out_full, g_full = _forward_and_grads(
        cfg.replace(share_backbone_train=False), variables, batch
    )
    out_share, g_share = _forward_and_grads(
        cfg.replace(share_backbone_train=True), variables, batch
    )
    np.testing.assert_allclose(
        np.asarray(out_share["pred_boxes"]),
        np.asarray(out_full["pred_boxes"]),
        atol=1e-5,
    )
    np.testing.assert_allclose(
        np.asarray(out_share["pred_sted"]),
        np.asarray(out_full["pred_sted"]),
        atol=1e-4,
    )
    flat_full = jax.tree_util.tree_leaves_with_path(g_full)
    flat_share = dict(jax.tree_util.tree_leaves_with_path(g_share))
    assert len(flat_full) == len(flat_share)
    for path, leaf in flat_full:
        ref = np.asarray(leaf)
        got = np.asarray(flat_share[path])
        scale = max(np.abs(ref).max(), 1e-6)
        np.testing.assert_allclose(
            got, ref, atol=5e-5 * scale, err_msg=jax.tree_util.keystr(path)
        )


def test_share_train_exact_divisible():
    _assert_share_train_exact(stride=2, vml=6)  # t == tc*k


def test_share_train_exact_ragged_tail():
    _assert_share_train_exact(stride=4, vml=6)  # tc*k = 8 > t = 6 (pad+slice)


def test_share_train_exact_stride1():
    _assert_share_train_exact(stride=1, vml=4)  # fast pass fully reused


def test_share_train_fast_contributes_no_backbone_grad():
    """The reused slow features are stop_gradient'ed on the fast side: with
    the slow-pass loss contribution removed (loss reads only fast-derived
    outputs? not separable here), instead assert the equivalent invariant —
    backbone grads are IDENTICAL with the fast branch present vs absent
    under share_backbone_train (the fast branch's only trainable touch is
    input_proj/fast heads, exactly the reference's no_grad semantics,
    /root/reference/models/tubedetr.py:127-131). The transformer DOES mix
    fast activations into the loss, so we assert instead that toggling
    share_backbone_train leaves every backbone grad leaf unchanged (covered
    above) and that the backbone grad is nonzero (the slow path trains)."""
    cfg = _cfg(stride=2)
    batch = _batch(cfg)
    model = build_model(cfg.replace(share_backbone_train=True))
    variables = model.init(jax.random.PRNGKey(0), **batch)
    _, grads = _forward_and_grads(
        cfg.replace(share_backbone_train=True), variables, batch
    )
    bb = grads["backbone"]
    total = sum(
        float(np.abs(np.asarray(g)).sum())
        for g in jax.tree_util.tree_leaves(bb)
    )
    assert total > 0.0  # slow pass still backpropagates into the backbone
