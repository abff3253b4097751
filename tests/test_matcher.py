"""Hungarian matcher + num_queries>1 path (VERDICT r2 missing #4 /
next-round #8).

The reference has no matcher (SURVEY §2.3) and its nq>1 layout is
internally inconsistent; this framework completes the capability with a
frame-major multi-query decoder + per-frame Hungarian assignment. Tests:
the rectangular Hungarian solver against brute force, the jit-able
single-target fast path against the full solver, the model's nq>1 output
contract, and that the criterion's matched loss picks the right query.
"""

import itertools

import numpy as np
import pytest

from tubedetr_tpu.losses.matcher import (
    box_match_cost,
    hungarian,
    match_single_target,
)

TINY = dict(
    backbone="resnet14",
    hidden_dim=32,
    nheads=4,
    enc_layers=1,
    dec_layers=2,
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
    guided_attn=True,
    sted=True,
    aux_loss=True,
    dropout=0.0,
)


def _brute_force(cost):
    """Exhaustive minimum assignment for small matrices."""
    n, m = cost.shape
    if n <= m:
        best, best_cols = np.inf, None
        for cols in itertools.permutations(range(m), n):
            s = cost[np.arange(n), list(cols)].sum()
            if s < best:
                best, best_cols = s, cols
        return best
    return _brute_force(cost.T)


@pytest.mark.quick
@pytest.mark.parametrize("shape", [(4, 4), (5, 3), (3, 5), (1, 6), (6, 1),
                                   (2, 2), (7, 7)])
def test_hungarian_matches_brute_force(shape):
    rng = np.random.RandomState(sum(shape))
    for trial in range(5):
        cost = rng.rand(*shape) * 10 - 3
        r, c = hungarian(cost)
        assert len(r) == min(shape)
        assert len(set(r.tolist())) == len(r)  # rows unique
        assert len(set(c.tolist())) == len(c)  # cols unique
        got = cost[r, c].sum()
        want = _brute_force(cost)
        assert abs(got - want) < 1e-9, (shape, trial, got, want)


@pytest.mark.quick
def test_single_target_fast_path_is_hungarian():
    rng = np.random.RandomState(0)
    cost = rng.rand(5, 9, 4)  # (B, T, nq) — one target per frame
    qi = np.asarray(match_single_target(cost))
    for b in range(5):
        for t in range(9):
            r, c = hungarian(cost[b, t][:, None])  # (nq, 1)
            assert qi[b, t] == r[0]


@pytest.mark.quick
def test_box_match_cost_prefers_exact_box():
    import jax.numpy as jnp

    tgt = jnp.asarray([[[0.5, 0.5, 0.2, 0.2]]])  # (1, 1, 4)
    pred = jnp.asarray([[[[0.9, 0.9, 0.1, 0.1],
                          [0.5, 0.5, 0.2, 0.2],
                          [0.2, 0.7, 0.3, 0.1]]]])  # (1, 1, 3, 4)
    cost = np.asarray(box_match_cost(pred, tgt))
    assert cost.shape == (1, 1, 3)
    assert cost[0, 0].argmin() == 1
    # exact box: zero L1, GIoU=1 -> cost = -giou_coef
    assert abs(cost[0, 0, 1] + 2.0) < 1e-5


def test_model_nq3_output_contract():
    """nq=3 forward: canonical single-tube outputs keep their (B, T, ...)
    shapes (query 0), per-query outputs ride under *_queries, TSA/CA
    weights stay frame-aggregated for the eval/guided-attn contract."""
    import jax

    from tubedetr_tpu.config import TubeDETRConfig
    from tubedetr_tpu.models.tubedetr import build_model

    cfg = TubeDETRConfig(num_queries=3, **TINY)
    model = build_model(cfg)
    b, t, tc, hw = 2, 6, 3, 64
    rng = np.random.RandomState(0)
    batch = dict(
        frames_slow=rng.randn(b, tc, hw, hw, 3).astype(np.float32),
        slow_pad_mask=np.zeros((b, tc, hw, hw), bool),
        tokens=rng.randint(4, 128, (b, 8)).astype(np.int32),
        text_pad_mask=np.arange(8)[None].repeat(b, 0) >= 5,
        durations=np.asarray([6, 4], np.int32),
        frames_fast=rng.randn(b, t, hw, hw, 3).astype(np.float32),
        fast_pad_mask=np.zeros((b, t, hw, hw), bool),
    )
    variables = model.init(jax.random.PRNGKey(0), **batch)
    assert variables["params"]["query_embed"].shape == (3, 32)
    out = model.apply(variables, **batch)
    out = {k: np.asarray(v) for k, v in out.items()}
    assert out["pred_boxes"].shape == (b, t, 4)
    assert out["pred_boxes_queries"].shape == (b, t, 3, 4)
    assert out["aux_pred_boxes_queries"].shape == (1, b, t, 3, 4)
    assert out["pred_sted"].shape == (b, t, 2)
    assert out["pred_sted_queries"].shape == (b, t, 3, 2)
    assert out["weights"].shape == (b, t, t)
    # aggregated TSA rows still sum to ~1 over valid keys
    row = out["weights"][0, 0]
    assert abs(row.sum() - 1.0) < 1e-3
    s = out["ca_weights"].shape
    assert s[:2] == (b, t)
    # canonical outputs == query 0 of the per-query outputs
    np.testing.assert_allclose(
        out["pred_boxes"], out["pred_boxes_queries"][:, :, 0], atol=1e-7
    )


def test_criterion_matched_loss_picks_best_query():
    """Craft per-query predictions where query 2 equals the GT: the matched
    bbox/giou losses must be ~0 while query 0 alone would be far off."""
    import jax.numpy as jnp

    from tubedetr_tpu.config import TubeDETRConfig
    from tubedetr_tpu.losses.criterion import SetCriterion

    cfg = TubeDETRConfig(num_queries=3, aux_loss=False, guided_attn=False,
                         sted=False, **{k: v for k, v in TINY.items()
                                        if k not in ("aux_loss",
                                                     "guided_attn", "sted")})
    crit = SetCriterion(cfg)
    b, t, nq = 1, 4, 3
    tgt = jnp.broadcast_to(
        jnp.asarray([0.5, 0.5, 0.2, 0.2]), (b, t, 4)
    )
    far = jnp.broadcast_to(jnp.asarray([0.1, 0.1, 0.05, 0.05]), (b, t, 4))
    pred_q = jnp.stack([far, far * 1.5, tgt], axis=2)  # query 2 is exact
    outputs = {
        "pred_boxes": pred_q[:, :, 0],
        "pred_boxes_queries": pred_q,
    }
    inter = jnp.asarray([[0, t - 1]], jnp.int32)
    tm = jnp.ones((b, t), bool)
    losses = crit(outputs, tgt, inter, tm)
    assert float(losses["loss_bbox"]) < 1e-6
    assert float(losses["loss_giou"]) < 1e-6

    # positional (unmatched) loss on query 0 alone would be large
    losses0 = crit({"pred_boxes": pred_q[:, :, 0]}, tgt, inter, tm)
    assert float(losses0["loss_bbox"]) > 0.5


def test_nq2_train_step_grads_flow():
    """One value_and_grad step at nq=2: finite loss, nonzero query_embed
    gradient for BOTH queries (the matcher routes gradient to matched
    queries; with random init both get matched somewhere)."""
    import jax
    import jax.numpy as jnp

    from tubedetr_tpu.config import TubeDETRConfig
    from tubedetr_tpu.losses.criterion import SetCriterion
    from tubedetr_tpu.models.tubedetr import build_model

    cfg = TubeDETRConfig(num_queries=2, **TINY)
    model = build_model(cfg)
    crit = SetCriterion(cfg)
    b, t, tc, hw = 1, 6, 3, 64
    rng = np.random.RandomState(1)
    batch = dict(
        frames_slow=rng.randn(b, tc, hw, hw, 3).astype(np.float32),
        slow_pad_mask=np.zeros((b, tc, hw, hw), bool),
        tokens=rng.randint(4, 128, (b, 8)).astype(np.int32),
        text_pad_mask=np.zeros((b, 8), bool),
        durations=np.full((b,), t, np.int32),
        frames_fast=rng.randn(b, t, hw, hw, 3).astype(np.float32),
        fast_pad_mask=np.zeros((b, t, hw, hw), bool),
    )
    tgt = jnp.asarray(
        np.clip(0.5 + 0.1 * rng.randn(b, t, 4), 0.1, 0.9), jnp.float32
    )
    inter = jnp.asarray([[1, t - 2]], jnp.int32)
    tm = np.ones((b, t), bool)
    variables = model.init(jax.random.PRNGKey(0), **batch)

    def loss_fn(params):
        out = model.apply(
            {"params": params, "buffers": variables.get("buffers", {})},
            **batch,
        )
        losses = crit(out, tgt, inter, tm)
        return crit.total(losses)

    loss, grads = jax.value_and_grad(loss_fn)(variables["params"])
    assert np.isfinite(float(loss))
    g = np.asarray(grads["query_embed"])
    assert g.shape == (2, 32)
    assert np.abs(g).sum() > 0


def test_nq_match_video_routes_whole_tube_to_one_query():
    """--nq_match video (round 5): the assignment is ONE query per video —
    the argmin of the cost summed over annotated frames — so even a frame
    where another query is locally closer is routed through the per-video
    winner. Craft: query 2 equals the GT on 3 of 4 frames; query 1 is
    exact on frame 0 where query 2 is far. Per-frame matching yields zero
    loss (each frame picks its local best); video matching must pick
    query 2 everywhere and pay query 2's frame-0 miss."""
    import jax.numpy as jnp

    from tubedetr_tpu.config import TubeDETRConfig
    from tubedetr_tpu.losses.criterion import SetCriterion

    base = {k: v for k, v in TINY.items()
            if k not in ("aux_loss", "guided_attn", "sted")}
    b, t, nq = 1, 4, 3
    tgt = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.2, 0.2]), (b, t, 4))
    far = jnp.broadcast_to(jnp.asarray([0.1, 0.1, 0.05, 0.05]), (b, t, 4))
    q2 = tgt.at[:, 0].set(far[:, 0])  # exact except frame 0
    q1 = far.at[:, 0].set(tgt[:, 0])  # exact ONLY on frame 0
    pred_q = jnp.stack([far * 1.5, q1, q2], axis=2)
    outputs = {"pred_boxes": pred_q[:, :, 0], "pred_boxes_queries": pred_q}
    inter = jnp.asarray([[0, t - 1]], jnp.int32)
    tm = jnp.ones((b, t), bool)

    per_frame = SetCriterion(TubeDETRConfig(
        num_queries=nq, aux_loss=False, guided_attn=False, sted=False,
        **base))(outputs, tgt, inter, tm)
    assert float(per_frame["loss_bbox"]) < 1e-6  # local best per frame

    per_video = SetCriterion(TubeDETRConfig(
        num_queries=nq, nq_match="video", aux_loss=False, guided_attn=False,
        sted=False, **base))(outputs, tgt, inter, tm)
    # query 2 wins the summed cost; its frame-0 L1 miss = |tgt - far|/4
    expected = float(jnp.abs(tgt[0, 0] - far[0, 0]).sum()) / t
    assert abs(float(per_video["loss_bbox"]) - expected) < 1e-6
