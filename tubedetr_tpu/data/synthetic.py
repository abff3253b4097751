"""Synthetic video grounding dataset for tests and smoke training.

Generates procedural clips (a colored moving square on noise) with exact
box/segment annotations in the VidSTG-style format, so the full
train/eval/postprocess/vIoU pipeline runs end-to-end without the VidSTG
downloads (SURVEY.md §4 test strategy).
"""

from __future__ import annotations

from typing import List

import numpy as np

from tubedetr_tpu.data.collate import VideoSample
from tubedetr_tpu.data.transforms import normalize_boxes_cxcywh
from tubedetr_tpu.ops.preprocess import IMAGENET_MEAN, IMAGENET_STD


def make_synthetic_sample(
    seed: int,
    t: int = 8,
    h: int = 64,
    w: int = 64,
    video_id: str | None = None,
    vocab: int = 128,
    text_len: int = 6,
) -> VideoSample:
    rng = np.random.RandomState(seed)
    frames = rng.randint(0, 60, size=(t, h, w, 3)).astype(np.uint8)

    # a bright square drifting across the video, visible for a sub-segment
    start = int(rng.randint(0, t // 2))
    end = int(rng.randint(start + max(1, t // 4), t))  # inclusive
    size = int(rng.randint(h // 6, h // 3))
    boxes = np.zeros((t, 4), np.float64)
    x0, y0 = rng.randint(0, w - size), rng.randint(0, h - size)
    dx, dy = rng.randint(-3, 4), rng.randint(-3, 4)
    for i in range(start, end + 1):
        xi = int(np.clip(x0 + dx * (i - start), 0, w - size))
        yi = int(np.clip(y0 + dy * (i - start), 0, h - size))
        frames[i, yi : yi + size, xi : xi + size] = [250, 60, 60]
        boxes[i] = [xi, yi, xi + size, yi + size]

    norm = (frames.astype(np.float32) / 255.0 - np.asarray(IMAGENET_MEAN)) / np.asarray(
        IMAGENET_STD
    )
    return VideoSample(
        frames=norm.astype(np.float32),
        valid_hw=(h, w),
        boxes_cxcywh=normalize_boxes_cxcywh(
            boxes.reshape(-1, 4), h, w
        ).reshape(t, 4).astype(np.float32),
        inter_idx=(start, end),
        frames_id=list(range(t)),
        video_id=video_id or f"synth{seed}",
        caption="the red square moving",
        tokens=rng.randint(2, vocab, size=(text_len,)).astype(np.int64),
        qtype="declarative",
        orig_size=(h, w),
    )


def make_synthetic_batch_samples(
    n: int, seed0: int = 0, **kw
) -> List[VideoSample]:
    return [make_synthetic_sample(seed0 + i, **kw) for i in range(n)]


def annotation_for_sample(s: VideoSample):
    """Matching VideoAnnotation so the vIoU evaluator can score synthetic
    predictions (boxes converted back to pixel xywh)."""
    from tubedetr_tpu.data.annotations import VideoAnnotation

    h, w = s.orig_size
    s0, e0 = s.inter_idx
    boxes = {}
    for i in range(s0, e0 + 1):
        cx, cy, bw, bh = s.boxes_cxcywh[i]
        boxes[i] = [
            float((cx - bw / 2) * w),
            float((cy - bh / 2) * h),
            float(bw * w),
            float(bh * h),
        ]
    return VideoAnnotation(
        video_id=s.video_id,
        frame_ids=list(s.frames_id),
        inter_frames=list(range(s0, e0 + 1)),
        tube_start_frame=s0,
        tube_end_frame=e0 + 1,
        boxes_xywh=boxes,
        caption=s.caption,
        qtype=s.qtype,
        video_path="",
        start_seconds=0.0,
        duration_seconds=max(1.0, len(s.frames_id) / 5.0),
    )


class SyntheticDataset:
    """Map-style synthetic dataset usable anywhere an STVGDataset is
    (``--combine_datasets synthetic`` smoke-trains the full CLI offline)."""

    def __init__(self, n: int = 16, t: int = 8, h: int = 64, w: int = 64,
                 seed: int = 0, vocab: int = 50265, text_len: int = 8):
        self.samples = [
            make_synthetic_sample(seed + i, t=t, h=h, w=w, vocab=vocab,
                                  text_len=text_len)
            for i in range(n)
        ]
        self.annotations = [annotation_for_sample(s) for s in self.samples]

    def __len__(self):
        return len(self.samples)

    def __getitem__(self, i: int) -> VideoSample:
        return self.samples[i]
