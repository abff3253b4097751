"""Collation into static-shaped, padded device batches.

Replaces the reference's ``video_collate_fn`` + ``NestedTensor``
(/root/reference/util/misc.py:40-178). Differences driven by XLA:

* every video pads to exactly ``T = video_max_len[_train]`` frames and
  ``Tc = ceil(T/stride)`` clips (the reference pads to the batch max);
* spatial dims pad to a (bucketed) static (H, W) with a pixel-level pad mask;
* the eval-time ``div_vid`` clip-splitting (util/misc.py:70-102) that chops
  long videos into ``video_max_len_train``-frame clips (with per-clip
  inter_idx re-offsets and repeated video_ids for sted ensembling) is
  implemented in ``split_video_into_clips``.

A batch is a plain dict of arrays — see field list in
``tubedetr_tpu.parallel.mesh.batch_pspec``.
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field
from typing import Dict, List, Optional

import numpy as np


@dataclass
class VideoSample:
    """One decoded + spatially-transformed video, host-side."""

    frames: np.ndarray  # (t, H, W, 3) float32, normalized, padded to bucket
    valid_hw: tuple  # (h, w) valid pixel extent inside (H, W)
    boxes_cxcywh: np.ndarray  # (t, 4) normalized; zeros outside the moment
    inter_idx: tuple  # (start, end) inclusive, (-100, -100) if empty
    frames_id: List[int]  # real frame ids, len == t
    video_id: object
    caption: str
    tokens: Optional[np.ndarray] = None  # (L,) int32
    qtype: str = "declarative"
    orig_size: tuple = (0, 0)  # (h, w) before transforms


def pad_time(sample_t: int, arr: np.ndarray, t: int) -> np.ndarray:
    if sample_t >= t:
        return arr[:t]
    pad = np.zeros((t - sample_t,) + arr.shape[1:], dtype=arr.dtype)
    return np.concatenate([arr, pad], axis=0)


def resolve_frames_dtype(name) -> np.dtype:
    """'float32' | 'bfloat16' -> numpy dtype (bf16 via ml_dtypes). bf16
    host batches halve the host->device frame transfer; numerically
    identical to shipping f32 when ``compute_dtype == bfloat16`` (the model
    casts inputs to the compute dtype at entry either way)."""
    if str(name) in ("bfloat16", "bf16"):
        import ml_dtypes

        return np.dtype(ml_dtypes.bfloat16)
    return np.dtype(name)


def collate(
    samples: List[VideoSample],
    t: int,
    stride: int,
    max_text_len: int,
    tokenizer=None,
    with_fast: bool = True,
    frames_dtype=np.float32,
    compact_pad_masks: bool = False,
) -> Dict[str, np.ndarray]:
    """Build the static-shaped batch dict from per-video samples.

    The slow stream is the stride-subsampled ``frames[::k]`` copy and the
    fast stream all frames (/root/reference/datasets/vidstg.py:250-252).

    ``compact_pad_masks`` ships the pixel pad masks as per-frame valid
    extents ``{fast,slow}_valid_hw`` (B, T, 2) int32 instead of the dense
    (B, T, H, W) bools — ~1e4x less host->device mask traffic; the step
    rebuilds the dense masks on device with two iota compares
    (parallel/train_step.py:expand_pad_masks, fused for free by XLA).
    """
    b = len(samples)
    tc = math.ceil(t / stride) if stride else t
    hmax = max(s.frames.shape[1] for s in samples)
    wmax = max(s.frames.shape[2] for s in samples)
    frames_dtype = resolve_frames_dtype(frames_dtype)

    frames_fast = np.zeros((b, t, hmax, wmax, 3), frames_dtype)
    fast_pad = np.ones((b, t, hmax, wmax), bool)
    frames_slow = np.zeros((b, tc, hmax, wmax, 3), frames_dtype)
    slow_pad = np.ones((b, tc, hmax, wmax), bool)
    fast_valid_hw = np.zeros((b, t, 2), np.int32)
    slow_valid_hw = np.zeros((b, tc, 2), np.int32)
    target_boxes = np.zeros((b, t, 4), np.float32)
    inter_idx = np.full((b, 2), -100, np.int32)
    durations = np.zeros((b,), np.int32)
    time_mask = np.zeros((b, t), bool)
    tokens = np.zeros((b, max_text_len), np.int64)
    text_pad = np.ones((b, max_text_len), bool)
    frames_id, video_ids, captions, qtypes, orig_sizes = [], [], [], [], []

    for i, s in enumerate(samples):
        st = min(s.frames.shape[0], t)
        vh, vw = s.valid_hw
        frames_fast[i, :st, : s.frames.shape[1], : s.frames.shape[2]] = s.frames[:st]
        fast_pad[i, :st, :vh, :vw] = False
        fast_valid_hw[i, :st] = (vh, vw)
        slow = s.frames[:st][::stride] if stride else s.frames[:st]
        sc = slow.shape[0]
        frames_slow[i, :sc, : slow.shape[1], : slow.shape[2]] = slow
        slow_pad[i, :sc, :vh, :vw] = False
        slow_valid_hw[i, :sc] = (vh, vw)
        target_boxes[i, :st] = s.boxes_cxcywh[:st]
        inter_idx[i] = s.inter_idx
        durations[i] = st
        time_mask[i, :st] = True
        if s.tokens is not None:
            lt = min(len(s.tokens), max_text_len)
            tokens[i, :lt] = s.tokens[:lt]
            text_pad[i, :lt] = False
        elif tokenizer is not None:
            ids = tokenizer.encode(s.caption)
            if len(ids) > max_text_len:
                # keep the trailing </s> like HF truncation does, so
                # pretrained text encoders never see an unterminated caption
                from tubedetr_tpu.models.tokenizer import EOS

                ids = ids[: max_text_len - 1] + [EOS]
            tokens[i, : len(ids)] = ids
            text_pad[i, : len(ids)] = False
        frames_id.append(list(s.frames_id[:st]))
        video_ids.append(s.video_id)
        captions.append(s.caption)
        qtypes.append(s.qtype)
        orig_sizes.append(s.orig_size)

    batch = {
        "frames_fast": frames_fast,
        "fast_pad_mask": fast_pad,
        "frames_slow": frames_slow,
        "slow_pad_mask": slow_pad,
        "target_boxes": target_boxes,
        "inter_idx": inter_idx,
        "durations": durations,
        "time_mask": time_mask,
        "tokens": tokens,
        "text_pad_mask": text_pad,
    }
    if compact_pad_masks:
        del batch["fast_pad_mask"], batch["slow_pad_mask"]
        batch["fast_valid_hw"] = fast_valid_hw
        batch["slow_valid_hw"] = slow_valid_hw
    if not with_fast:
        del batch["frames_fast"]
        batch.pop("fast_pad_mask", None)
        batch.pop("fast_valid_hw", None)
    meta = {
        "frames_id": frames_id,
        "video_ids": video_ids,
        "captions": captions,
        "qtypes": qtypes,
        "orig_sizes": orig_sizes,
    }
    return batch, meta


def split_video_into_clips(sample: VideoSample, clip_len: int) -> List[VideoSample]:
    """Eval-time div_vid splitting (/root/reference/util/misc.py:70-102):
    chop a long video into ceil(t/clip_len) clips sharing the video_id and
    caption; per-clip inter_idx is re-offset into clip coordinates, or
    (-100, -100) when the clip misses the moment entirely."""
    t = sample.frames.shape[0]
    n_clips = math.ceil(t / clip_len)
    out = []
    for c in range(n_clips):
        lo, hi = c * clip_len, min((c + 1) * clip_len, t)
        s0, e0 = sample.inter_idx
        if s0 < 0 or e0 < lo or s0 >= hi:
            inter = (-100, -100)
        else:
            inter = (max(s0, lo) - lo, min(e0, hi - 1) - lo)
        out.append(
            VideoSample(
                frames=sample.frames[lo:hi],
                valid_hw=sample.valid_hw,
                boxes_cxcywh=sample.boxes_cxcywh[lo:hi],
                inter_idx=inter,
                frames_id=sample.frames_id[lo:hi],
                video_id=sample.video_id,
                caption=sample.caption,
                tokens=sample.tokens,
                qtype=sample.qtype,
                orig_size=sample.orig_size,
            )
        )
    return out
