"""vIoU evaluator tests with hand-constructed annotations/predictions."""

import numpy as np

from tubedetr_tpu.data.annotations import VideoAnnotation, sample_frame_ids
from tubedetr_tpu.eval.viou import VIoUEvaluator


def make_ann(video_id="v0", qtype="declarative"):
    # 10 frames sampled 0..9; GT tube covers frames [3, 8) with unit boxes
    frame_ids = list(range(10))
    boxes = {f: [10.0, 10.0, 20.0, 20.0] for f in range(3, 8)}  # xywh
    return VideoAnnotation(
        video_id=video_id,
        frame_ids=frame_ids,
        inter_frames=list(range(3, 8)),
        tube_start_frame=3,
        tube_end_frame=8,
        boxes_xywh=boxes,
        caption="c",
        qtype=qtype,
        video_path="",
        start_seconds=0,
        duration_seconds=2,
    )


def test_perfect_prediction_gives_viou_1():
    ann = make_ann()
    ev = VIoUEvaluator([ann])
    ev.update(
        {f"v0_{f}": {"boxes": [[10.0, 10.0, 30.0, 30.0]]} for f in range(3, 8)}
    )
    ev.video_update({"v0": {"sted": [3, 8], "qtype": "declarative"}})
    out = ev.summarize()
    assert abs(out["declarative_tiou"] - 1.0) < 1e-9
    assert abs(out["declarative_viou"] - 1.0) < 1e-9
    assert out["declarative_viou@0.5"] == 1.0
    assert abs(out["declarative_gt_viou"] - 1.0) < 1e-9


def test_temporal_miss_gives_zero_viou_but_gt_viou_counts():
    ann = make_ann()
    ev = VIoUEvaluator([ann])
    ev.update(
        {f"v0_{f}": {"boxes": [[10.0, 10.0, 30.0, 30.0]]} for f in range(3, 8)}
    )
    # predicted segment entirely outside GT
    ev.video_update({"v0": {"sted": [0, 2], "qtype": "declarative"}})
    out = ev.summarize()
    assert out["declarative_tiou"] == 0.0
    assert out["declarative_viou"] == 0.0
    assert out["declarative_gt_viou"] == 1.0


def test_half_overlap_viou_math():
    ann = make_ann()
    ev = VIoUEvaluator([ann])
    # predict boxes with IoU=1 on GT frames
    ev.update(
        {f"v0_{f}": {"boxes": [[10.0, 10.0, 30.0, 30.0]]} for f in range(3, 8)}
    )
    # pred segment [5, 10): intersection [5, 8) = frames 5,6,7;
    # union [3, 10) = frames 3..9 -> 7 frames
    ev.video_update({"v0": {"sted": [5, 10], "qtype": "declarative"}})
    out = ev.summarize()
    np.testing.assert_allclose(out["declarative_viou"], 3 / 7, atol=1e-9)
    # tiou: inter 3, union (5 + 5 - 3) = 7
    np.testing.assert_allclose(out["declarative_tiou"], 3 / 7, atol=1e-9)
    assert out["declarative_viou@0.3"] == 1.0
    assert out["declarative_viou@0.5"] == 0.0


def test_qtype_split_averages_separately():
    a1, a2 = make_ann("v0", "declarative"), make_ann("v1", "interrogative")
    ev = VIoUEvaluator([a1, a2])
    for vid in ("v0", "v1"):
        ev.update(
            {f"{vid}_{f}": {"boxes": [[10, 10, 30, 30]]} for f in range(3, 8)}
        )
    ev.video_update({"v0": {"sted": [3, 8], "qtype": "declarative"}})
    ev.video_update({"v1": {"sted": [0, 2], "qtype": "interrogative"}})
    out = ev.summarize()
    assert out["declarative_viou"] == 1.0
    assert out["interrogative_viou"] == 0.0


def test_sample_frame_ids_rule():
    # video at 25 fps sampled at 5 fps: keep every ~5th frame
    ids = sample_frame_ids(0, 50, 25.0, 5.0, 200)
    assert ids[0] == 0
    assert len(ids) == 10
    assert all(b - a in (4, 5, 6) for a, b in zip(ids, ids[1:]))
    # cap at video_max_len with uniform subsample
    ids2 = sample_frame_ids(0, 1000, 5.0, 5.0, 200)
    assert len(ids2) == 200
