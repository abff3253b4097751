"""vIoU evaluation (VidSTG + HC-STVG), host-side numpy.

Metric definitions mirror /root/reference/datasets/vidstg_eval.py:91-205 and
hcstvg_eval.py: per video,

* tIoU of predicted vs GT [start, end) segments;
* vIoU = sum of per-frame box IoU over frames in the pred∩GT segment,
  divided by |frames in pred∪GT segment|;
* vIoU@R recall at thresholds {0.3, 0.5};
* gt_vIoU: spatial-only upper bound over the GT moment.

Multi-process merge: instead of the reference's pickled NCCL all_gather
(vidstg_eval.py:278-301), each JAX process contributes its prediction dicts
via ``jax.experimental.multihost_utils`` or per-host files; see
``synchronize_between_processes``.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Dict, List, Optional

import numpy as np

from tubedetr_tpu.core.boxes import np_box_iou
from tubedetr_tpu.data.annotations import VideoAnnotation


class VIoUEvaluator:
    """Accumulates per-frame box predictions and per-video sted predictions,
    then computes vIoU metrics against the annotations."""

    def __init__(
        self,
        annotations: List[VideoAnnotation],
        iou_thresholds=(0.3, 0.5),
        tmp_loc: bool = True,
        save_pred: bool = False,
    ):
        self.anns = {a.video_id: a for a in annotations}
        self.iou_thresholds = list(iou_thresholds)
        self.tmp_loc = tmp_loc
        self.save_pred = save_pred
        self.predictions: Dict[str, Dict] = {}  # "videoid_frameid" -> {boxes}
        self.video_predictions: Dict = {}  # video_id -> {sted, qtype}
        self.tsa_weights: Dict = {}
        self.text_weights: Dict = {}
        self.spatial_weights: Dict = {}
        self.pred_sted_logits: Dict = {}
        self.results = None

    # -- accumulation ----------------------------------------------------
    def update(self, predictions: Dict[str, Dict]):
        self.predictions.update(predictions)

    def video_update(self, video_predictions: Dict):
        self.video_predictions.update(video_predictions)

    def save(self, tsa, text_w, spatial_w, sted_logits, video_ids):
        """Store attention weights per video for --test introspection
        (/root/reference/datasets/vidstg_eval.py:257-276)."""
        for i, vid in enumerate(video_ids):
            self.tsa_weights[vid] = np.asarray(tsa[i]).tolist()
            self.text_weights[vid] = np.asarray(text_w[i]).tolist()
            self.spatial_weights[vid] = np.asarray(spatial_w[i]).tolist()
            self.pred_sted_logits[vid] = np.asarray(sted_logits[i]).tolist()

    # -- distributed merge ----------------------------------------------
    def synchronize_between_processes(
        self,
        sync_dir: str = "",
        process_index: Optional[int] = None,
        process_count: Optional[int] = None,
        barrier=None,
    ):
        """Merge per-process prediction dicts.

        The reference all_gathers pickled dicts over NCCL
        (/root/reference/datasets/vidstg_eval.py:278-301). JAX has no object
        collective, so each process writes its shard to shared storage and
        every process reads all shards back after a device barrier — the
        robust multi-host equivalent. No-op for a single process.

        ``process_index``/``process_count``/``barrier`` default to the live
        JAX runtime; tests inject explicit values.
        """
        import jax

        if process_count is None:
            process_count = jax.process_count()
        if process_index is None:
            process_index = jax.process_index()
        if barrier is None:
            # coordination-service barrier, NOT a device collective — gloo /
            # ICI collectives time out in ~30 s while per-process compile
            # skew can be minutes (see tubedetr_tpu/parallel/dist.py)
            from tubedetr_tpu.parallel.dist import barrier as _dist_barrier

            barrier = lambda: _dist_barrier("viou_eval_merge")
        if process_count == 1:
            return
        if not sync_dir:
            raise ValueError("multi-host eval merge needs sync_dir on shared storage")
        import pickle

        import os

        idx = process_index
        os.makedirs(sync_dir, exist_ok=True)
        payload = {
            "predictions": self.predictions,
            "video_predictions": self.video_predictions,
            "tsa_weights": self.tsa_weights,
            "text_weights": self.text_weights,
            "spatial_weights": self.spatial_weights,
            "pred_sted_logits": self.pred_sted_logits,
        }
        tmp = os.path.join(sync_dir, f"shard_{idx}.pkl.tmp")
        with open(tmp, "wb") as f:
            pickle.dump(payload, f)
        os.replace(tmp, os.path.join(sync_dir, f"shard_{idx}.pkl"))
        barrier()
        import time

        for i in range(process_count):
            if i == idx:
                continue
            path = os.path.join(sync_dir, f"shard_{i}.pkl")
            deadline = time.time() + 60  # tolerate shared-fs visibility lag
            while not os.path.exists(path) and time.time() < deadline:
                time.sleep(0.2)
            with open(path, "rb") as f:
                other = pickle.load(f)
            self.predictions.update(other["predictions"])
            self.video_predictions.update(other["video_predictions"])
            self.tsa_weights.update(other["tsa_weights"])
            self.text_weights.update(other["text_weights"])
            self.spatial_weights.update(other["spatial_weights"])
            self.pred_sted_logits.update(other["pred_sted_logits"])

    # -- scoring ---------------------------------------------------------
    def evaluate(self) -> Dict:
        vid_metrics = {}
        for video_id, vpred in self.video_predictions.items():
            ann = self.anns[video_id]
            qtype = vpred.get("qtype", ann.qtype)
            m: Dict = {"qtype": qtype, "img_metrics": {}}

            if self.tmp_loc:
                gt_sted = (ann.tube_start_frame, ann.tube_end_frame)
                pred_sted = vpred["sted"]
                max_start = max(gt_sted[0], pred_sted[0])
                min_end = min(gt_sted[1], pred_sted[1])
                min_start = min(gt_sted[0], pred_sted[0])
                max_end = max(gt_sted[1], pred_sted[1])
                if min_end <= max_start:
                    tiou = 0.0
                else:
                    inter = min_end - max_start
                    union = (
                        (gt_sted[1] - gt_sted[0])
                        + (pred_sted[1] - pred_sted[0])
                        - inter
                    )
                    tiou = inter / union
                m.update(
                    {"gt_sted": list(gt_sted), "pred_sted": list(pred_sted),
                     "tiou": float(tiou)}
                )
                union_predgt = [
                    f for f in ann.frame_ids if min_start <= f < max_end
                ]
                inter_predgt = {
                    f for f in ann.frame_ids if max_start <= f < min_end
                }
            else:
                union_predgt = ann.frame_ids
                inter_predgt = set(ann.frame_ids)

            viou, gt_viou = 0.0, 0.0
            for fid in ann.inter_frames:
                key = f"{video_id}_{fid}"
                if key not in self.predictions:
                    raise RuntimeError(f"missing prediction for frame {key}")
                pred_box = np.asarray(self.predictions[key]["boxes"]).reshape(1, 4)
                x, y, w, h = ann.boxes_xywh[fid]
                gt_box = np.array([[x, y, x + w, y + h]])
                iou = float(np_box_iou(pred_box, gt_box)[0, 0])
                m["img_metrics"][key] = {
                    "iou": iou,
                    "pred_box": pred_box[0].tolist(),
                    "gt_box": gt_box[0].tolist(),
                }
                if self.tmp_loc and fid in inter_predgt:
                    viou += iou
                gt_viou += iou

            if self.tmp_loc:
                viou = viou / max(len(union_predgt), 1)
                m["viou"] = viou
                for th in self.iou_thresholds:
                    m[f"viou@{th}"] = float(viou > th)
            gt_viou = gt_viou / max(len(ann.inter_frames), 1)
            m["gt_viou"] = gt_viou
            for th in self.iou_thresholds:
                m[f"gt_viou@{th}"] = float(gt_viou > th)
            vid_metrics[video_id] = m
        return vid_metrics

    def summarize(self) -> Optional[Dict]:
        """Average metrics per qtype category
        (/root/reference/datasets/vidstg_eval.py:303-351)."""
        self.results = self.evaluate()
        sums = defaultdict(lambda: defaultdict(float))
        counts = defaultdict(int)
        for m in self.results.values():
            q = m["qtype"]
            counts[q] += 1
            keys = ["gt_viou"] + [f"gt_viou@{t}" for t in self.iou_thresholds]
            if self.tmp_loc:
                keys += (
                    ["tiou", "viou"] + [f"viou@{t}" for t in self.iou_thresholds]
                )
            for k in keys:
                sums[q][k] += m[k]
        out = {}
        for q in sums:
            for k in sums[q]:
                out[f"{q}_{k}"] = sums[q][k] / counts[q]
        if self.save_pred:
            out["predictions"] = self.predictions
            out["video_predictions"] = self.video_predictions
            out["vid_metrics"] = self.results
            if self.tsa_weights:
                out["tsa_weights"] = self.tsa_weights
                out["text_weights"] = self.text_weights
                out["spatial_weights"] = self.spatial_weights
                out["pred_sted"] = self.pred_sted_logits
        return out
