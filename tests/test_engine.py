"""Engine-level behaviors: NaN abort (SURVEY.md §5.3 failure detection),
per-step LR injection, meter accumulation."""

import numpy as np
import pytest

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.train.engine import train_one_epoch
from tubedetr_tpu.train.logging import MetricLogger, SmoothedValue


class FakeLoader:
    def __init__(self, n):
        self.n = n

    def __len__(self):
        return self.n

    def __iter__(self):
        for i in range(self.n):
            yield {"dummy": i}, {}


def test_nan_guard_aborts():
    cfg = TubeDETRConfig()

    def nan_step(state, batch, lrs, seed):
        return state, {"loss_total": np.float32("nan")}

    with pytest.raises(SystemExit):
        train_one_epoch(cfg, nan_step, object(), FakeLoader(3), 0, 100)


def test_per_step_lr_injected_and_stats_returned():
    cfg = TubeDETRConfig(schedule="linear_with_warmup", lr_drop=10, epochs=10,
                         fraction_warmup_steps=0.1)
    seen_lrs = []

    def ok_step(state, batch, lrs, seed):
        seen_lrs.append({k: float(v) for k, v in lrs.items()})
        return state, {"loss_total": np.float32(1.5), "loss_bbox": np.float32(0.2)}

    state, stats = train_one_epoch(cfg, ok_step, object(), FakeLoader(4), 0, 40)
    assert len(seen_lrs) == 4
    # reference semantics (adjust_learning_rate runs AFTER optimizer.step,
    # /root/reference/engine.py:149-153): step 0 runs at the base LRs, step 1
    # at warmup gamma(0) == 0, then the text-encoder warmup rises
    assert seen_lrs[0]["lr_text_encoder"] == pytest.approx(cfg.text_encoder_lr)
    assert seen_lrs[1]["lr_text_encoder"] == pytest.approx(0.0)
    assert seen_lrs[2]["lr_text_encoder"] > seen_lrs[1]["lr_text_encoder"]
    # main lr is constant in epoch 0 under linear_with_warmup
    assert seen_lrs[0]["lr"] == pytest.approx(cfg.lr)
    assert seen_lrs[3]["lr"] == pytest.approx(cfg.lr)
    assert stats["loss"] == pytest.approx(1.5)


def test_smoothed_value_and_logger():
    v = SmoothedValue(window_size=3)
    for x in (1.0, 2.0, 3.0, 4.0):
        v.update(x)
    assert v.avg == pytest.approx(3.0)  # window of last 3
    assert v.global_avg == pytest.approx(2.5)
    assert v.max == 4.0 and v.value == 4.0

    logger = MetricLogger(print_freq=100)
    logger.update(loss=1.0)
    logger.update(loss=3.0)
    assert logger.meters["loss"].global_avg == pytest.approx(2.0)
    out = list(logger.log_every(range(3), "hdr"))
    assert out == [0, 1, 2]


def test_evaluate_slices_padded_eval_batches():
    """Ragged eval batches are padded to the mesh data axis by repeating the
    last sample (apps/train.py _ShardedEval); meta keeps the real length and
    evaluate must slice the padded outputs away — evaluator feeds identical
    to the unpadded run."""
    from tubedetr_tpu.train.engine import evaluate

    cfg = TubeDETRConfig(sted=True, guided_attn=False)
    t, b_real, pad = 4, 3, 1
    rng = np.random.RandomState(0)
    sted = rng.randn(b_real, t, 2).astype(np.float32)
    boxes = (rng.rand(b_real, t, 4).astype(np.float32) * 0.4) + 0.2

    def make_batch(padded: bool):
        b = b_real + (pad if padded else 0)
        rep = lambda a: np.concatenate([a, np.repeat(a[-1:], pad, 0)]) if padded else a
        batch = {
            "durations": np.full((b,), t, np.int32),
            "time_mask": np.ones((b, t), bool),
            "inter_idx": np.tile(np.array([[0, t - 1]], np.int32), (b, 1)),
            "_boxes": rep(boxes),
            "_sted": rep(sted),
        }
        meta = {
            "video_ids": [f"v{i}" for i in range(b_real)],
            "frames_id": [list(range(t))] * b_real,
            "qtypes": ["declarative"] * b_real,
            "orig_sizes": [(32, 32)] * b_real,
        }
        return batch, meta

    def eval_step(state, batch):
        return {"pred_boxes": batch["_boxes"], "pred_sted": batch["_sted"]}, {}

    class RecordingEvaluator:
        def __init__(self):
            self.preds = {}
            self.vids = {}

        def update(self, preds):
            self.preds.update(preds)

        def video_update(self, vp):
            self.vids.update(vp)

    results = []
    for padded in (False, True):
        ev = RecordingEvaluator()

        class OneBatch:
            def __iter__(self):
                yield make_batch(padded)

            def __len__(self):
                return 1

        evaluate(cfg, eval_step, None, OneBatch(), ev, "vidstg")
        results.append(ev)

    assert results[0].preds.keys() == results[1].preds.keys()
    for k in results[0].preds:
        assert results[0].preds[k] == results[1].preds[k]
    assert results[0].vids == results[1].vids
    assert set(results[0].vids) == {"v0", "v1", "v2"}


def test_evaluate_nq_select_sted_reads_winning_query():
    """--nq_select sted (nq>1 inference): evaluate() ranks queries by sted
    confidence and feeds the winner's boxes/segment to the evaluator;
    --nq_select first keeps the canonical query 0."""
    from tubedetr_tpu.train.engine import evaluate

    t, nq = 6, 2
    rng = np.random.RandomState(0)
    boxes_q = np.zeros((1, t, nq, 4), np.float32)
    boxes_q[:, :, 0] = [0.9, 0.9, 0.05, 0.05]  # query 0: wrong corner
    boxes_q[:, :, 1] = [0.5, 0.5, 0.2, 0.2]  # query 1: the grounding
    sted_q = np.zeros((1, t, nq, 2), np.float32)
    sted_q[0, 1, 1, 0] = 8.0  # query 1 confidently grounds frames [1, 4]
    sted_q[0, 4, 1, 1] = 8.0

    def eval_step(state, batch):
        return {
            "pred_boxes": boxes_q[:, :, 0],
            "pred_sted": sted_q[:, :, 0],
            "pred_boxes_queries": boxes_q,
            "pred_sted_queries": sted_q,
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

    got = {}
    for select in ("first", "sted"):
        cfg = TubeDETRConfig(num_queries=nq, nq_select=select,
                             guided_attn=False)
        ev = RecordingEvaluator()
        evaluate(cfg, eval_step, None, OneBatch(), ev, "vidstg")
        got[select] = ev

    # query 0's box center is (90, 90) in pixels; query 1's is (50, 50)
    assert got["first"].preds["v0_0"]["boxes"][0][0] > 80.0
    assert got["sted"].preds["v0_0"]["boxes"][0][0] == pytest.approx(40.0)
    # and the segment comes from query 1's confident peaks
    assert got["sted"].vids["v0"]["sted"] == [1.0, 5.0]
