"""Bounding-box utilities (JAX + numpy).

Functional equivalents of /root/reference/util/box_ops.py. The JAX variants
are batched and mask-friendly: instead of the reference's NxM pairwise
matrices with a diag() extraction in the loss, we provide elementwise paired
IoU/GIoU so the loss is a single fused elementwise computation over the
(B, T) frame grid with no gather.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def box_cxcywh_to_xyxy(x: jnp.ndarray) -> jnp.ndarray:
    xc, yc, w, h = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [xc - 0.5 * w, yc - 0.5 * h, xc + 0.5 * w, yc + 0.5 * h], axis=-1
    )


def box_xyxy_to_cxcywh(x: jnp.ndarray) -> jnp.ndarray:
    x0, y0, x1, y1 = jnp.split(x, 4, axis=-1)
    return jnp.concatenate(
        [(x0 + x1) / 2, (y0 + y1) / 2, x1 - x0, y1 - y0], axis=-1
    )


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of [..., 4] xyxy boxes."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def paired_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise IoU of two [..., 4] xyxy box arrays. Returns (iou, union)."""
    area1 = box_area(boxes1)
    area2 = box_area(boxes2)
    lt = jnp.maximum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.minimum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0)
    inter = wh[..., 0] * wh[..., 1]
    union = area1 + area2 - inter
    iou = inter / union
    return iou, union


def paired_generalized_box_iou(boxes1: jnp.ndarray, boxes2: jnp.ndarray):
    """Elementwise GIoU of [..., 4] xyxy boxes.

    Same math as /root/reference/util/box_ops.py:94-115 restricted to the
    diagonal (the criterion only consumes the diagonal). Degenerate boxes
    (x1 < x0) are the caller's responsibility; with sigmoid-parameterized
    cxcywh predictions w, h >= 0 always holds.
    """
    iou, union = paired_box_iou(boxes1, boxes2)
    lt = jnp.minimum(boxes1[..., :2], boxes2[..., :2])
    rb = jnp.maximum(boxes1[..., 2:], boxes2[..., 2:])
    wh = jnp.clip(rb - lt, min=0)
    area = wh[..., 0] * wh[..., 1]
    return iou - (area - union) / area


# ---------------------------------------------------------------------------
# numpy variants used by the host-side evaluators
# ---------------------------------------------------------------------------


def np_box_area(boxes: np.ndarray) -> np.ndarray:
    assert boxes.ndim == 2 and boxes.shape[-1] == 4
    return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])


def np_box_iou(boxes1: np.ndarray, boxes2: np.ndarray) -> np.ndarray:
    """Pairwise NxM IoU (mirrors /root/reference/util/box_ops.py:46-62)."""
    area1 = np_box_area(boxes1)
    area2 = np_box_area(boxes2)
    lt = np.maximum(boxes1[:, None, :2], boxes2[:, :2])
    rb = np.minimum(boxes1[:, None, 2:], boxes2[:, 2:])
    wh = (rb - lt).clip(min=0)
    inter = wh[:, :, 0] * wh[:, :, 1]
    union = area1[:, None] + area2 - inter
    return inter / union
