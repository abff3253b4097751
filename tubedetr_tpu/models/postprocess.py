"""Postprocessors: model outputs -> pixel boxes and temporal segments.

Host-side numpy re-implementation of /root/reference/models/postprocessors.py
(the math is tiny; keeping it on host avoids a device round-trip per video
and handles the variable-length clip-ensembling concatenation that has no
static shape).
"""

from __future__ import annotations

from typing import Dict, List, Sequence

import numpy as np


def postprocess_boxes(
    pred_boxes: np.ndarray,  # (..., 4) cxcywh normalized
    target_sizes: np.ndarray,  # (..., 2) (h, w) original image sizes
) -> np.ndarray:
    """cxcywh[0,1] -> xyxy pixels (/root/reference/models/postprocessors.py:87-109)."""
    pred_boxes = np.asarray(pred_boxes, dtype=np.float64)
    cx, cy, w, h = np.moveaxis(pred_boxes, -1, 0)
    boxes = np.stack(
        [cx - 0.5 * w, cy - 0.5 * h, cx + 0.5 * w, cy + 0.5 * h], axis=-1
    )
    img_h = np.asarray(target_sizes)[..., 0]
    img_w = np.asarray(target_sizes)[..., 1]
    scale = np.stack([img_w, img_h, img_w, img_h], axis=-1)
    return boxes * scale


def postprocess_sted(
    pred_sted: np.ndarray,  # (B, T, 2) start/end logits
    frames_id: Sequence[Sequence[int]],  # per-video real frame ids
    video_ids: Sequence,  # used to ensemble clips of a split video
    time_mask: np.ndarray,  # (B, T) True on VALID frames
) -> List[List[float]]:
    """Start/end logits -> [start_frame, end_frame) per video.

    Mirrors /root/reference/models/postprocessors.py:13-84:
    * consecutive batch entries with the same video_id are clips of one video
      (eval-time clip splitting): their logits are concatenated in order;
    * the (start, end) pair maximizes log p(start) + log p(end) subject to
      end > start (lower-triangular -inf mask);
    * indices map back to real frame ids; the end frame is exclusive (+1).
    """
    pred_sted = np.asarray(pred_sted, dtype=np.float64)
    time_mask = np.asarray(time_mask, dtype=bool)
    b = pred_sted.shape[0]
    _assert_clip_adjacency(video_ids)

    # group clips by consecutive duplicate video_ids
    steds_list: List[np.ndarray] = []
    group_frames: List[List[int]] = []
    for i in range(b):
        masked = np.where(time_mask[i][:, None], pred_sted[i], -np.inf)
        valid_frames = list(frames_id[i])[: int(time_mask[i].sum())]
        if i > 0 and video_ids[i] == video_ids[i - 1]:
            steds_list[-1] = np.concatenate([steds_list[-1], masked], axis=0)
            group_frames[-1] = group_frames[-1] + valid_frames
        else:
            steds_list.append(masked)
            group_frames.append(valid_frames)

    results: List[List[float]] = []
    for sted, frames in zip(steds_list, group_frames):
        t = sted.shape[0]
        with np.errstate(invalid="ignore"):
            start_log = _log_softmax(sted[:, 0])
            end_log = _log_softmax(sted[:, 1])
        score = start_log[:, None] + end_log[None, :]  # (T, T)
        tri = np.tril(np.full((t, t), -np.inf), k=0)
        score = score + tri  # end must be strictly after start
        s_idx, e_idx = np.unravel_index(np.nanargmax(score), score.shape)
        padded = frames + [0] * (t - len(frames))
        start_frame = float(padded[s_idx])
        end_frame = float(padded[e_idx]) + 1.0  # end frame exclusive
        results.append([start_frame, end_frame])
    return results


def select_query_by_sted(
    pred_sted_q: np.ndarray,  # (B, T, nq, 2) per-query start/end logits
    time_mask: np.ndarray,  # (B, T) True on VALID frames
    video_ids: Sequence,  # clip-ensembling groups (batch-adjacent)
) -> np.ndarray:
    """Rank a multi-query model's queries by their own temporal-grounding
    confidence and pick ONE query per video (``--nq_select sted``).

    TubeDETR has no classification/objectness head (the structural reason
    the reference never ships num_queries > 1 — matcher.py docstring), but
    the sted head IS a trained per-query confidence: during nq>1 training
    the matched query's start/end logits are pushed toward the GT segment
    (losses/criterion.py), so the query that ends up carrying the video's
    grounding exposes the highest achievable ``log p(start) + log p(end)``.
    Query q's score is the maximum of that joint over valid start < end
    pairs on the video's clip-ensembled logits — exactly the objective
    ``postprocess_sted`` then maximizes for the selected query. All clips
    (batch rows) of one video share the selection.

    Returns (B,) query indices.
    """
    pred_sted_q = np.asarray(pred_sted_q, dtype=np.float64)
    time_mask = np.asarray(time_mask, dtype=bool)
    b, _, nq, _ = pred_sted_q.shape
    _assert_clip_adjacency(video_ids)

    # group clips by consecutive duplicate video_ids (same adjacency
    # contract as postprocess_sted)
    groups: List[List[int]] = []
    for i in range(b):
        if i > 0 and video_ids[i] == video_ids[i - 1]:
            groups[-1].append(i)
        else:
            groups.append([i])

    out = np.zeros(b, dtype=np.int64)
    for rows in groups:
        sted = np.concatenate(
            [
                np.where(
                    time_mask[i][:, None, None], pred_sted_q[i], -np.inf
                )
                for i in rows
            ],
            axis=0,
        )  # (Tg, nq, 2)
        t = sted.shape[0]
        tri = np.tril(np.full((t, t), -np.inf), k=0)
        conf = np.full(nq, -np.inf)
        for q in range(nq):
            if not np.isfinite(sted[:, q, 0]).any():
                continue  # all frames masked: no signal for this query
            with np.errstate(invalid="ignore"):
                start_log = _log_softmax(sted[:, q, 0])
                end_log = _log_softmax(sted[:, q, 1])
            score = start_log[:, None] + end_log[None, :] + tri
            conf[q] = np.nanmax(score)
        best = int(np.argmax(conf)) if np.isfinite(conf).any() else 0
        out[rows] = best
    return out


def select_query_by_objectness(
    pred_obj_q: np.ndarray,  # (B, T, nq) per-(frame, query) objectness logits
    time_mask: np.ndarray,  # (B, T) True on VALID frames
) -> np.ndarray:
    """Per-FRAME query selection from the learned objectness head
    (``--nq_select objectness``): frame t reads the box/sted logits of the
    query whose objectness logit is highest on that frame.

    This is the readout the measured ``--nq_select sted`` failure calls
    for (docs/NOTES.md round 5): per-frame Hungarian matching lets
    different frames of one video train different queries, so no single
    per-video winner exists — but the objectness head is trained on
    exactly that per-frame match (losses/criterion.py:objectness_loss),
    so its per-frame argmax recovers the matched query frame by frame.
    Masked frames return 0 (they are sliced away downstream).

    Returns (B, T) query indices.
    """
    pred_obj_q = np.asarray(pred_obj_q, dtype=np.float64)
    time_mask = np.asarray(time_mask, dtype=bool)
    sel = pred_obj_q.argmax(-1)  # (B, T)
    return np.where(time_mask, sel, 0).astype(np.int64)


def _assert_clip_adjacency(video_ids: Sequence) -> None:
    """Clips of one video must be batch-ADJACENT (the loader emits them
    consecutively; a shuffled eval loader would silently corrupt the
    grouping — same implicit assumption as the reference,
    /root/reference/models/postprocessors.py:24-52). Shared by
    ``postprocess_sted`` and ``select_query_by_sted`` so a mis-ordered
    batch fails loudly on both paths."""
    first_pos = {}
    for i, vid in enumerate(video_ids):
        if vid in first_pos:
            assert video_ids[i - 1] == vid, (
                f"clips of video {vid!r} are not batch-adjacent "
                f"(positions {first_pos[vid]} and {i}); clip grouping "
                f"requires the loader's unshuffled clip order"
            )
        first_pos.setdefault(vid, i)


def _log_softmax(x: np.ndarray) -> np.ndarray:
    m = np.max(x[np.isfinite(x)]) if np.isfinite(x).any() else 0.0
    e = np.exp(x - m)
    return x - m - np.log(e.sum())


def build_postprocessors(dataset_name: str) -> Dict[str, object]:
    pp = {"bbox": postprocess_boxes}
    if dataset_name in ("vidstg", "hcstvg"):
        pp[dataset_name] = postprocess_sted
    return pp
