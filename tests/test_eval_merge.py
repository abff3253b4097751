"""Multi-process evaluation merge: two evaluator shards write + read the
shared-storage shards and converge to identical merged predictions."""

import numpy as np

from tests.test_eval import make_ann
from tubedetr_tpu.eval.viou import VIoUEvaluator


def test_two_shard_merge(tmp_path):
    anns = [make_ann("v0"), make_ann("v1")]
    ev0 = VIoUEvaluator(anns)
    ev1 = VIoUEvaluator(anns)
    # shard 0 holds video v0, shard 1 holds video v1
    ev0.update({f"v0_{f}": {"boxes": [[10, 10, 30, 30]]} for f in range(3, 8)})
    ev0.video_update({"v0": {"sted": [3, 8], "qtype": "declarative"}})
    ev1.update({f"v1_{f}": {"boxes": [[10, 10, 30, 30]]} for f in range(3, 8)})
    ev1.video_update({"v1": {"sted": [3, 8], "qtype": "declarative"}})

    sync = str(tmp_path / "sync")
    # emulate the barrier: each "process" writes its shard during sync; run
    # shard 1's write first via a barrier callback so shard 0's read finds it
    def barrier_writing_other():
        ev1.synchronize_between_processes(sync, 1, 2, barrier=lambda: None)

    ev0.synchronize_between_processes(sync, 0, 2, barrier=barrier_writing_other)

    for ev in (ev0, ev1):
        assert set(ev.video_predictions) == {"v0", "v1"}
        assert len(ev.predictions) == 10
        out = ev.summarize()
        assert abs(out["declarative_viou"] - 1.0) < 1e-9


def test_single_process_merge_is_noop(tmp_path):
    ev = VIoUEvaluator([make_ann("v0")])
    ev.synchronize_between_processes("", 0, 1, barrier=lambda: None)
