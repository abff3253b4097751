"""Criterion tests vs hand-computed values (SURVEY.md §4 strategy)."""

import math

import jax.numpy as jnp
import numpy as np
import pytest

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.losses.criterion import (
    SetCriterion,
    loss_boxes,
    loss_guided_attn,
    loss_sted,
)

# fast confidence subset for the 1-core box (VERDICT r2 weak #7)
pytestmark = pytest.mark.quick



def test_loss_boxes_hand_computed():
    # one video, 3 frames, moment = frames [0, 1]
    pred = jnp.array([[[0.5, 0.5, 0.2, 0.2], [0.5, 0.5, 0.2, 0.2], [0.9, 0.9, 0.1, 0.1]]])
    tgt = jnp.array([[[0.5, 0.5, 0.2, 0.2], [0.6, 0.5, 0.2, 0.2], [0.0, 0.0, 0.0, 0.0]]])
    pos = jnp.array([[True, True, False]])
    out = loss_boxes(pred, tgt, pos, jnp.float32(2.0))
    # frame0 exact: l1=0, giou=1 -> losses 0; frame1: l1=0.1, giou of
    # [0.4,0.4,0.6,0.6] vs [0.5,0.4,0.7,0.6]: inter=0.1*0.2=0.02,
    # union=0.04+0.04-0.02=0.06, iou=1/3; hull=[0.4,0.4,0.7,0.6]=0.06
    # giou = 1/3 - (0.06-0.06)/0.06 = 1/3
    np.testing.assert_allclose(float(out["loss_bbox"]), 0.1 / 2, atol=1e-6)
    np.testing.assert_allclose(
        float(out["loss_giou"]), (0.0 + (1 - 1 / 3)) / 2, atol=1e-6
    )


def test_loss_sted_perfect_prediction_is_small():
    t = 20
    logits = np.full((1, t, 2), -20.0, dtype=np.float32)
    logits[0, 4, 0] = 20.0  # start at 4
    logits[0, 11, 1] = 20.0  # end at 11
    time_mask = jnp.ones((1, t), dtype=bool)
    good = loss_sted(jnp.asarray(logits), jnp.array([[4, 11]]), time_mask)
    bad = loss_sted(jnp.asarray(logits), jnp.array([[15, 18]]), time_mask)
    assert float(good["loss_sted"]) < float(bad["loss_sted"])
    assert np.isfinite(float(good["loss_sted"]))


def test_loss_sted_matches_manual_kl():
    """Check against a directly-computed KL with Gaussian target (sigma=1)."""
    rng = np.random.RandomState(0)
    t = 6
    logits = rng.randn(1, t, 2).astype(np.float32)
    inter = np.array([[1, 4]])
    time_mask = np.ones((1, t), dtype=bool)
    out = float(
        loss_sted(jnp.asarray(logits), jnp.asarray(inter), jnp.asarray(time_mask))[
            "loss_sted"
        ]
    )

    def manual(col, center):
        x = logits[0, :, col]
        p = np.exp(x - x.max())
        p = p / p.sum()
        ar = np.arange(t)
        tgt = np.exp(-((ar - center) ** 2) / 2.0) + 1e-6
        tgt = tgt / tgt.sum()
        return (p * np.log((p + 1e-6) / tgt)).sum()

    expected = (manual(0, 1) + manual(1, 4)) / t  # mean over B*T
    np.testing.assert_allclose(out, expected, rtol=1e-4)


def test_loss_guided_attn_hand_computed():
    # 1 video, 3 frames, moment = frame 1 only; uniform weights 0.5
    w = jnp.full((1, 3, 3), 0.5)
    pos = jnp.array([[False, True, False]])
    tm = jnp.ones((1, 3), dtype=bool)
    out = float(loss_guided_attn(w, pos, tm)["loss_guided_attn"])
    # negatives: rows 0 and 2 -> nb_neg = 2 + eps
    # each kept row contributes 3 * -log(0.5 + 1e-6); sum over 2 rows / 2
    per = -math.log(1 - 0.5 + 1e-6)
    np.testing.assert_allclose(out, (2 * 3 * per) / (2 + 1e-6), rtol=1e-5)


def test_criterion_aux_expansion_and_total():
    cfg = TubeDETRConfig(dec_layers=3, aux_loss=True, guided_attn=True, sted=True)
    crit = SetCriterion(cfg)
    b, t = 2, 5
    rng = np.random.RandomState(0)
    sig = lambda x: 1 / (1 + np.exp(-x))
    outputs = {
        "pred_boxes": jnp.asarray(sig(rng.randn(b, t, 4)).astype(np.float32)),
        "pred_sted": jnp.asarray(rng.randn(b, t, 2).astype(np.float32)),
        "weights": jnp.asarray(sig(rng.randn(b, t, t)).astype(np.float32) * 0.5),
        "aux_pred_boxes": jnp.asarray(sig(rng.randn(2, b, t, 4)).astype(np.float32)),
        "aux_pred_sted": jnp.asarray(rng.randn(2, b, t, 2).astype(np.float32)),
        "aux_weights": jnp.asarray(sig(rng.randn(2, b, t, t)).astype(np.float32) * 0.5),
    }
    tboxes = jnp.asarray(sig(rng.randn(b, t, 4)).astype(np.float32) * 0.3 + 0.2)
    inter = jnp.array([[0, 2], [1, 4]])
    tm = jnp.asarray(np.array([[1, 1, 1, 1, 0], [1, 1, 1, 1, 1]], dtype=bool))
    losses = crit(outputs, tboxes, inter, tm)
    for base in ("loss_bbox", "loss_giou", "loss_sted", "loss_guided_attn"):
        assert base in losses
        assert f"{base}_0" in losses and f"{base}_1" in losses
        assert f"{base}_2" not in losses
    total = float(crit.total(losses))
    assert np.isfinite(total) and total > 0
    # weight dict covers every loss key
    assert set(losses) == set(crit.weight_dict)


def test_empty_intersection_contributes_zero_box_loss():
    cfg = TubeDETRConfig(dec_layers=1, aux_loss=False, guided_attn=False, sted=False)
    crit = SetCriterion(cfg)
    b, t = 1, 4
    outputs = {"pred_boxes": jnp.full((b, t, 4), 0.5)}
    tboxes = jnp.zeros((b, t, 4))
    inter = jnp.array([[-100, -100]])
    tm = jnp.ones((b, t), dtype=bool)
    losses = crit(outputs, tboxes, inter, tm)
    assert float(losses["loss_bbox"]) == 0.0
    assert float(losses["loss_giou"]) == 0.0
