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
