"""Learned objectness head for num_queries > 1 (round 5).

The reference has no objectness head — the structural reason its nq>1
path is unusable (losses/matcher.py docstring). The round-5 nq study
measured WHY ``--nq_select sted`` fails under per-frame Hungarian
matching: different frames of one video train different queries, so no
per-video winner exists (docs/NOTES.md). The objectness head closes that
loop: it trains on the per-frame match itself (losses/criterion.py:
objectness_loss) and ``--nq_select objectness`` reads each frame's
winning query at inference (models/postprocess.py:
select_query_by_objectness) — the same per-frame composite the training
losses supervise.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tubedetr_tpu.config import TubeDETRConfig, loss_weight_dict
from tubedetr_tpu.losses.criterion import SetCriterion
from tubedetr_tpu.models.postprocess import select_query_by_objectness
from tubedetr_tpu.models.tubedetr import build_model

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


@pytest.mark.quick
def test_select_query_by_objectness_per_frame_argmax():
    obj = np.array(
        [
            [[0.1, 2.0], [3.0, -1.0], [0.0, 0.5]],  # winners: 1, 0, 1
            [[5.0, 0.0], [0.0, 5.0], [-1.0, -2.0]],  # winners: 0, 1, 0
        ]
    )  # (B=2, T=3, nq=2)
    tm = np.array([[True, True, False], [True, True, True]])
    sel = select_query_by_objectness(obj, tm)
    assert sel.shape == (2, 3)
    # masked frame -> 0 regardless of logits
    np.testing.assert_array_equal(sel, [[1, 0, 0], [0, 1, 0]])


@pytest.mark.quick
def test_criterion_objectness_bce_matches_hand_computation():
    """The objectness BCE target is the per-frame Hungarian match: craft
    predictions with a known matched query per frame and verify the loss
    against a numpy hand computation, including that frames outside the
    moment contribute nothing and the num_boxes normalization matches the
    box losses'."""
    base = {k: v for k, v in TINY.items()
            if k not in ("aux_loss", "guided_attn", "sted")}
    cfg = TubeDETRConfig(num_queries=2, aux_loss=False, guided_attn=False,
                         sted=False, **base)
    crit = SetCriterion(cfg)
    assert "loss_objectness" in crit.weight_dict

    b, t, nq = 1, 4, 2
    tgt = jnp.broadcast_to(jnp.asarray([0.5, 0.5, 0.2, 0.2]), (b, t, 4))
    far = jnp.broadcast_to(jnp.asarray([0.1, 0.1, 0.05, 0.05]), (b, t, 4))
    # matched query alternates per frame: 0, 1, 0, 1
    q0 = jnp.stack([tgt[:, 0], far[:, 1], tgt[:, 2], far[:, 3]], axis=1)
    q1 = jnp.stack([far[:, 0], tgt[:, 1], far[:, 2], tgt[:, 3]], axis=1)
    pred_q = jnp.stack([q0, q1], axis=2)  # (B, T, nq, 4)
    obj = jnp.asarray(
        np.array([[[1.0, -2.0], [0.5, 0.5], [-1.0, 3.0], [2.0, 2.0]]]),
        jnp.float32,
    )  # (B, T, nq)
    outputs = {
        "pred_boxes": pred_q[:, :, 0],
        "pred_boxes_queries": pred_q,
        "pred_obj_queries": obj,
    }
    inter = jnp.asarray([[0, 2]], jnp.int32)  # frames 0..2 annotated
    tm = jnp.ones((b, t), bool)
    losses = crit(outputs, tgt, inter, tm)
    assert "loss_objectness" in losses

    # hand computation: matched = [0, 1, 0] on the 3 annotated frames
    x = np.asarray(obj)[0]  # (T, nq)
    onehot = np.zeros((t, nq))
    for f, q in enumerate([0, 1, 0, 1]):
        onehot[f, q] = 1.0
    bce = np.maximum(x, 0) - x * onehot + np.log1p(np.exp(-np.abs(x)))
    expected = bce[:3].mean(-1).sum() / 3.0  # num_boxes = 3
    assert float(losses["loss_objectness"]) == pytest.approx(
        float(expected), rel=1e-5
    )

    # a head that nails the match (large margin) drives the loss ~0
    perfect = jnp.asarray(
        20.0 * (2.0 * np.asarray(onehot)[None] - 1.0), jnp.float32
    )
    low = crit({**outputs, "pred_obj_queries": perfect}, tgt, inter, tm)
    assert float(low["loss_objectness"]) < 1e-6


@pytest.mark.quick
def test_weight_dict_objectness_only_for_multi_query():
    base = {k: v for k, v in TINY.items() if k != "aux_loss"}
    wd1 = loss_weight_dict(TubeDETRConfig(aux_loss=True, **base))
    assert "loss_objectness" not in wd1
    wd4 = loss_weight_dict(
        TubeDETRConfig(num_queries=4, aux_loss=True, **base)
    )
    assert wd4["loss_objectness"] == 1.0
    # aux expansion covers the objectness term per decoder layer
    assert "loss_objectness_0" in wd4


@pytest.mark.quick
def test_evaluate_objectness_reads_per_frame_winner():
    """evaluate() with --nq_select objectness: each frame's box comes from
    the query the objectness head scores highest on that frame — the
    readout that works when per-frame matching trains different queries
    on different frames (the measured sted-selection failure mode)."""
    from tubedetr_tpu.train.engine import evaluate

    t, nq = 6, 2
    boxes_q = np.zeros((1, t, nq, 4), np.float32)
    boxes_q[:, :, 0] = [0.9, 0.9, 0.05, 0.05]  # query 0: corner box
    boxes_q[:, :, 1] = [0.5, 0.5, 0.2, 0.2]  # query 1: center box
    sted_q = np.zeros((1, t, nq, 2), np.float32)
    sted_q[0, 1, 1, 0] = 8.0  # query 1 grounds frames [1, 4]
    sted_q[0, 4, 1, 1] = 8.0
    obj_q = np.zeros((1, t, nq), np.float32)
    obj_q[0, :, 1] = 5.0  # query 1 wins every frame...
    obj_q[0, 0, 0] = 10.0  # ...except frame 0, where query 0 wins

    def eval_step(state, batch):
        return {
            "pred_boxes": boxes_q[:, :, 0],
            "pred_sted": sted_q[:, :, 0],
            "pred_boxes_queries": boxes_q,
            "pred_sted_queries": sted_q,
            "pred_obj_queries": obj_q,
        }, {}

    batch = {
        "durations": np.full((1,), t, np.int32),
        "time_mask": np.ones((1, t), bool),
        "inter_idx": np.array([[0, t - 1]], np.int32),
    }
    meta = {
        "video_ids": ["v0"],
        "frames_id": [list(range(t))],
        "qtypes": ["declarative"],
        "orig_sizes": [(100, 100)],
    }

    class RecordingEvaluator:
        def __init__(self):
            self.preds, self.vids = {}, {}

        def update(self, preds):
            self.preds.update(preds)

        def video_update(self, vp):
            self.vids.update(vp)

    class OneBatch:
        def __iter__(self):
            yield batch, meta

        def __len__(self):
            return 1

    cfg = TubeDETRConfig(num_queries=nq, nq_select="objectness",
                         guided_attn=False)
    ev = RecordingEvaluator()
    evaluate(cfg, eval_step, None, OneBatch(), ev, "vidstg")

    # frame 0 reads query 0's corner box; frames 1+ read query 1's center
    assert ev.preds["v0_0"]["boxes"][0][0] > 80.0
    assert ev.preds["v0_1"]["boxes"][0][0] == pytest.approx(40.0)
    # the per-frame sted composite carries query 1's confident peaks
    assert ev.vids["v0"]["sted"] == [1.0, 5.0]


def test_nq2_model_head_and_real_eval_step(tmp_path):
    """Full-model contract on a real jitted eval step: the objectness head
    exists only at nq>1, its outputs have the (B, T, nq) shape, the
    make_eval_step filter keeps them for --nq_select objectness (and drops
    them for the default), the criterion trains it (nonzero grad), and the
    param tree at nq=1 is UNCHANGED (reference checkpoints convert
    untouched)."""
    from tubedetr_tpu.data.collate import collate
    from tubedetr_tpu.data.synthetic import make_synthetic_batch_samples
    from tubedetr_tpu.parallel.train_step import (
        create_train_state,
        make_eval_step,
        model_inputs,
    )

    samples = make_synthetic_batch_samples(2, t=6)

    # nq=1: no objectness head in the tree
    cfg1 = TubeDETRConfig(**TINY)
    batch, _ = collate(
        samples, cfg1.video_max_len_train, cfg1.stride, cfg1.max_text_len
    )
    model1 = build_model(cfg1)
    v1 = model1.init(jax.random.PRNGKey(0), **model_inputs(batch))
    assert "objectness_embed" not in v1["params"]

    for select, expect in (("objectness", True), ("first", False)):
        cfg = TubeDETRConfig(num_queries=2, nq_select=select, **TINY)
        model = build_model(cfg)
        variables = model.init(jax.random.PRNGKey(0), **model_inputs(batch))
        assert "objectness_embed" in variables["params"]
        state, _, _ = create_train_state(cfg, variables)
        out, losses = make_eval_step(cfg, model)(state, batch)
        assert ("pred_obj_queries" in out) is expect, (select, sorted(out))
        if expect:
            b, t = np.asarray(out["pred_boxes"]).shape[:2]
            assert np.asarray(out["pred_obj_queries"]).shape == (b, t, 2)
            assert "loss_objectness" in losses
            assert np.isfinite(float(losses["loss_objectness"]))
            assert "loss_objectness_0" in losses  # aux layer

    # gradient reaches the head through the criterion
    cfg = TubeDETRConfig(num_queries=2, **TINY)
    model = build_model(cfg)
    crit = SetCriterion(cfg)
    variables = model.init(jax.random.PRNGKey(1), **model_inputs(batch))

    def loss_fn(params):
        out = model.apply(
            {"params": params, "buffers": variables.get("buffers", {})},
            **model_inputs(batch),
        )
        losses = crit(
            out, batch["target_boxes"], batch["inter_idx"],
            batch["time_mask"],
        )
        return crit.total(losses)

    grads = jax.grad(loss_fn)(variables["params"])
    g = jax.tree_util.tree_leaves(grads["objectness_embed"])
    assert sum(float(np.abs(np.asarray(x)).sum()) for x in g) > 0
