"""Spatial video transforms, host-side parameter sampling + box math.

Replaces /root/reference/datasets/video_transforms.py. The reference applies
a chain of per-frame cv2/PIL ops (multi-scale resize -> random crop ->
resize -> normalize) on the CPU — the pipeline hot loop (SURVEY.md §2.9).

TPU-native split:

* HOST (this module): sample the random transform parameters once per clip,
  transform box coordinates (tiny numpy math), and *compose* the pixel
  operators. Every step in the chain (resize, crop+resize) is a separable
  linear operator on pixels, so the whole chain collapses to one pair of
  interpolation matrices ``(A_h, A_w)`` by matrix product — exact sequential
  semantics, one device pass.
* DEVICE (``tubedetr_tpu/ops/preprocess.py``): ``out = A_h @ img @ A_w^T``
  fused with /255 + ImageNet normalization — two MXU matmuls per clip.

Output H/W are rounded up to ``SIZE_BUCKET`` multiples (XLA needs a bounded
shape set; the reference used ragged per-batch shapes) with the valid extent
carried in a pad mask, matching the reference's NestedTensor convention.

The per-resolution scale tables and the transform chain mirror
/root/reference/datasets/video_transforms.py:327-434; box transform math
mirrors the DETR crop/resize rules (video_transforms.py:40-324) including
the ``respect_boxes`` retry loop.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

from tubedetr_tpu.ops.preprocess import _interp_matrix

SIZE_BUCKET = 32


# per-resolution augmentation tables (reference video_transforms.py:338-405)
RESOLUTION_TABLES = {
    128: dict(scales=[96, 128], max_size=213, resizes=[80, 100, 120], crop=64),
    224: dict(scales=[128, 160, 192, 224], max_size=373, resizes=[100, 150, 200], crop=96),
    256: dict(scales=[160, 192, 224, 256], max_size=427, resizes=[140, 180, 220], crop=128),
    288: dict(scales=[160, 192, 224, 256, 288], max_size=480, resizes=[150, 200, 250], crop=128),
    320: dict(scales=[192, 224, 256, 288, 320], max_size=533, resizes=[200, 240, 280], crop=160),
    352: dict(scales=[224, 256, 288, 320, 352], max_size=587, resizes=[200, 250, 300], crop=192),
    384: dict(scales=[224, 256, 288, 320, 352, 384], max_size=640, resizes=[200, 250, 300], crop=192),
    416: dict(scales=[256, 288, 320, 352, 384, 416], max_size=693, resizes=[240, 300, 360], crop=224),
    448: dict(scales=[256, 288, 320, 352, 384, 416, 448], max_size=746, resizes=[240, 300, 360], crop=224),
    480: dict(scales=[288, 320, 352, 384, 416, 448, 480], max_size=800, resizes=[240, 300, 360], crop=240),
    800: dict(scales=[480, 512, 544, 576, 608, 640, 672, 704, 736, 768, 800],
              max_size=1333, resizes=[400, 500, 600], crop=384),
}


def size_with_aspect_ratio(
    h: int, w: int, size: int, max_size: Optional[int] = None
) -> Tuple[int, int]:
    """DETR resize rule: shortest side -> ``size``, long side capped at
    ``max_size`` (aspect preserved). Returns (oh, ow)."""
    if max_size is not None:
        min_orig, max_orig = float(min(h, w)), float(max(h, w))
        if max_orig / min_orig * size > max_size:
            size = int(round(max_size * min_orig / max_orig))
    if (h <= w and h == size) or (w <= h and w == size):
        return h, w
    if h < w:
        oh = size
        ow = int(size * w / h)
    else:
        ow = size
        oh = int(size * h / w)
    return oh, ow


@dataclass
class ClipTransform:
    """A fully-determined (sampled) spatial transform for one clip."""

    a_h: np.ndarray  # (out_h, in_h) composed interpolation matrix
    a_w: np.ndarray  # (out_w, in_w)
    out_h: int  # valid output extent (<= a_h.shape[0] after bucketing)
    out_w: int
    boxes_xyxy: np.ndarray  # transformed boxes at output scale, (N, 4)
    hflip: bool

    def padded(self, pad_h: int, pad_w: int) -> "ClipTransform":
        """Zero-pad the operator rows to the (pad_h, pad_w) bucket."""
        ah = np.zeros((pad_h, self.a_h.shape[1]), np.float32)
        ah[: self.a_h.shape[0]] = self.a_h
        aw = np.zeros((pad_w, self.a_w.shape[1]), np.float32)
        aw[: self.a_w.shape[0]] = self.a_w
        return ClipTransform(ah, aw, self.out_h, self.out_w, self.boxes_xyxy, self.hflip)


def _resize_step(h, w, oh, ow):
    return _interp_matrix(h, oh), _interp_matrix(w, ow)


def _crop_resize_step(h, w, top, left, ch, cw, oh, ow):
    return (
        _interp_matrix(h, oh, float(top), float(ch)),
        _interp_matrix(w, ow, float(left), float(cw)),
    )


def _resize_boxes(boxes, h, w, oh, ow):
    r = np.array([ow / w, oh / h, ow / w, oh / h], np.float64)
    return boxes * r


def _crop_boxes(boxes, top, left, ch, cw):
    out = boxes - np.array([left, top, left, top], np.float64)
    out[:, 0::2] = out[:, 0::2].clip(0, cw)
    out[:, 1::2] = out[:, 1::2].clip(0, ch)
    return out


def _boxes_alive(boxes):
    return bool(((boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])).all())


def sample_train_transform(
    rng: np.random.Generator,
    h: int,
    w: int,
    boxes_xyxy: np.ndarray,
    resolution: int = 224,
    respect_boxes: bool = True,
    allow_hflip: bool = False,
) -> ClipTransform:
    """Sample the reference train chain
    (video_transforms.py:407-424): with p=0.5 either a plain multi-scale
    resize, or resize -> RandomSizeCrop (respecting boxes, <=100 retries) ->
    multi-scale resize."""
    tbl = RESOLUTION_TABLES[resolution]
    hflip = bool(allow_hflip and rng.random() < 0.5)
    if hflip:
        flipped = boxes_xyxy.copy()
        flipped[:, 0] = w - boxes_xyxy[:, 2]
        flipped[:, 2] = w - boxes_xyxy[:, 0]
        boxes_xyxy = flipped

    if rng.random() < 0.5:
        size = int(rng.choice(tbl["scales"]))
        oh, ow = size_with_aspect_ratio(h, w, size, tbl["max_size"])
        ah, aw = _resize_step(h, w, oh, ow)
        boxes = _resize_boxes(boxes_xyxy, h, w, oh, ow)
        ct = ClipTransform(ah, aw, oh, ow, boxes, hflip)
    else:
        # step 1: small resize
        size1 = int(rng.choice(tbl["resizes"]))
        oh1, ow1 = size_with_aspect_ratio(h, w, size1, None)
        ah1, aw1 = _resize_step(h, w, oh1, ow1)
        boxes1 = _resize_boxes(boxes_xyxy, h, w, oh1, ow1)
        # step 2: random size crop with box-preserving retries
        crop_found = None
        for _ in range(100):
            tw = int(rng.integers(tbl["crop"], min(ow1, tbl["max_size"]) + 1))
            th = int(rng.integers(tbl["crop"], min(oh1, tbl["max_size"]) + 1))
            top = int(rng.integers(0, oh1 - th + 1))
            left = int(rng.integers(0, ow1 - tw + 1))
            cand = _crop_boxes(boxes1, top, left, th, tw)
            if not respect_boxes or _boxes_alive(cand) or len(cand) == 0:
                crop_found = (top, left, th, tw, cand)
                break
        if crop_found is None:  # patience exhausted: keep the uncropped clip
            top, left, th, tw, boxes2 = 0, 0, oh1, ow1, boxes1
        else:
            top, left, th, tw, boxes2 = crop_found
        # step 3: multi-scale resize of the crop
        size3 = int(rng.choice(tbl["scales"]))
        oh3, ow3 = size_with_aspect_ratio(th, tw, size3, tbl["max_size"])
        ah3, aw3 = _crop_resize_step(oh1, ow1, top, left, th, tw, oh3, ow3)
        boxes3 = _resize_boxes(boxes2, th, tw, oh3, ow3)
        # compose: out = A3 @ (A1 @ img) => A = A3 @ A1
        ct = ClipTransform(
            (ah3 @ ah1).astype(np.float32),
            (aw3 @ aw1).astype(np.float32),
            oh3,
            ow3,
            boxes3,
            hflip,
        )
    if hflip:
        # fold the horizontal flip into the column operator: the box math
        # above already worked in flipped coordinates
        ct = ClipTransform(
            ct.a_h, ct.a_w[:, ::-1].copy(), ct.out_h, ct.out_w,
            ct.boxes_xyxy, True,
        )
    return ct


def make_eval_transform(h: int, w: int, boxes_xyxy: np.ndarray, resolution: int):
    """Val/test: resize shortest side to ``resolution`` (capped)."""
    tbl = RESOLUTION_TABLES[resolution]
    oh, ow = size_with_aspect_ratio(h, w, resolution, tbl["max_size"])
    ah, aw = _resize_step(h, w, oh, ow)
    return ClipTransform(ah, aw, oh, ow, _resize_boxes(boxes_xyxy, h, w, oh, ow), False)


def bucket(x: int, multiple: int = SIZE_BUCKET) -> int:
    return ((x + multiple - 1) // multiple) * multiple


def hflip_caption(caption: str) -> str:
    """Swap 'left'/'right' words when a clip is horizontally flipped
    (reference RandomHorizontalFlip caption logic,
    /root/reference/datasets/video_transforms.py:72-108; disabled in all
    reference builders via cautious=True, off by default here too)."""
    out = []
    for w in caption.split():
        core = w.strip(".,!?;:")
        if core == "left":
            out.append(w.replace("left", "right"))
        elif core == "right":
            out.append(w.replace("right", "left"))
        else:
            out.append(w)
    return " ".join(out)


def normalize_boxes_cxcywh(boxes_xyxy: np.ndarray, h: int, w: int) -> np.ndarray:
    """xyxy pixels -> normalized cxcywh in [0,1] (reference Normalize,
    video_transforms.py:40-59)."""
    b = np.asarray(boxes_xyxy, np.float64)
    cx = (b[:, 0] + b[:, 2]) / 2 / w
    cy = (b[:, 1] + b[:, 3]) / 2 / h
    bw = (b[:, 2] - b[:, 0]) / w
    bh = (b[:, 3] - b[:, 1]) / h
    return np.stack([cx, cy, bw, bh], axis=1)


def prepare_boxes(raw_boxes_xywh: np.ndarray, h: int, w: int) -> np.ndarray:
    """Annotation xywh -> clamped xyxy (reference ``prepare``,
    video_transforms.py:437-458). Degenerate boxes are kept as zeros (static
    shapes) — they are masked out of the loss by the moment mask."""
    b = np.asarray(raw_boxes_xywh, np.float64).reshape(-1, 4).copy()
    b[:, 2:] += b[:, :2]
    b[:, 0::2] = b[:, 0::2].clip(0, w)
    b[:, 1::2] = b[:, 1::2].clip(0, h)
    return b
