"""TubeDETR losses, mask-based and fully batched.

Functional re-derivation of /root/reference/models/tubedetr.py:257-460.
With num_queries=1 (every published config) predictions align positionally
with per-frame targets and no matcher runs — exactly the reference. With
num_queries>1 a per-frame Hungarian assignment selects the matched query
per decoder layer (losses/matcher.py; a capability the reference's broken
nq>1 path never had). Where the reference gathers the in-moment frames
with a Python-built ``keep`` index (/root/reference/engine.py:83-110), we keep
static (B, T) grids and weight by a ``positive_map`` mask — identical math,
XLA-friendly shapes.

``num_boxes`` is the *global* number of annotated frames across the data-
parallel batch: under ``pjit`` the loss is written over the global batch, so
the sum over (B, T) divided by the global count reproduces the reference's
all-reduced normalization (/root/reference/models/tubedetr.py:406-413
combined with DDP gradient averaging).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax.numpy as jnp

from tubedetr_tpu.config import TubeDETRConfig, loss_weight_dict
from tubedetr_tpu.core import boxes as box_ops
from tubedetr_tpu.core.masking import inter_positive_map


def loss_boxes(
    pred_boxes: jnp.ndarray,  # (B, T, 4) cxcywh in [0,1]
    target_boxes: jnp.ndarray,  # (B, T, 4) cxcywh in [0,1]
    positive_map: jnp.ndarray,  # (B, T) bool — frame is inside the GT moment
    num_boxes: jnp.ndarray,  # scalar, already globally reduced
) -> Dict[str, jnp.ndarray]:
    w = positive_map.astype(pred_boxes.dtype)
    l1 = jnp.abs(pred_boxes - target_boxes).sum(-1)  # (B, T)
    loss_bbox = (l1 * w).sum() / jnp.maximum(num_boxes, 1.0)
    giou = box_ops.paired_generalized_box_iou(
        box_ops.box_cxcywh_to_xyxy(pred_boxes),
        box_ops.box_cxcywh_to_xyxy(target_boxes),
    )
    loss_giou = ((1.0 - giou) * w).sum() / jnp.maximum(num_boxes, 1.0)
    return {"loss_bbox": loss_bbox, "loss_giou": loss_giou}


def loss_sted(
    pred_sted: jnp.ndarray,  # (B, T, 2) start/end logits
    inter_idx: jnp.ndarray,  # (B, 2) [start, end] inclusive
    time_mask: jnp.ndarray,  # (B, T) bool, True on VALID frames
    sigma: float = 1.0,
) -> Dict[str, jnp.ndarray]:
    """KL(pred ‖ quantized-Gaussian target) on start and end distributions
    (/root/reference/models/tubedetr.py:292-349). Padded positions get -1e32
    before the softmax and are excluded from the sum; the final reduction is
    a mean over all B*T positions (reference's ``.mean()``)."""
    b, t, _ = pred_sted.shape
    eps = 1e-6
    sted = jnp.where(time_mask[:, :, None], pred_sted, -1e32)
    ar = jnp.arange(t, dtype=jnp.float32)[None, :]

    def kl(logits, center):
        target = jnp.exp(
            -((ar - center[:, None].astype(jnp.float32)) ** 2) / (2 * sigma**2)
        )
        target = target + eps
        target = target / target.sum(-1, keepdims=True)  # F.normalize p=1
        pred = jnp.exp(logits - logits.max(-1, keepdims=True))
        pred = pred / pred.sum(-1, keepdims=True)
        loss = pred * jnp.log((pred + eps) / target)
        return loss * time_mask

    total = kl(sted[:, :, 0], inter_idx[:, 0]) + kl(sted[:, :, 1], inter_idx[:, 1])
    return {"loss_sted": total.mean()}


def loss_guided_attn(
    weights: jnp.ndarray,  # (B, T, T) head-averaged decoder TSA weights
    positive_map: jnp.ndarray,  # (B, T) bool
    time_mask: jnp.ndarray,  # (B, T) bool, True on valid frames
) -> Dict[str, jnp.ndarray]:
    """-log(1 - w) on TSA columns outside the GT moment
    (/root/reference/models/tubedetr.py:351-372): rows belonging to positive
    (or padded) queries are dropped; each row-sum over keys is normalized by
    the number of negative queries of that video."""
    eps = 1e-6
    pos_or_pad = positive_map | (~time_mask)  # (B, T)
    loss = -jnp.log(1.0 - weights + eps)  # (B, T, T)
    loss = jnp.where(pos_or_pad[:, :, None], 0.0, loss)
    nb_neg = (~pos_or_pad).sum(1).astype(loss.dtype) + eps  # (B,)
    loss = loss.sum(2) / nb_neg[:, None]  # (B, T)
    return {"loss_guided_attn": loss.sum(1).mean()}


class SetCriterion:
    """Bundles the per-layer losses and the aux expansion."""

    def __init__(self, cfg: TubeDETRConfig):
        self.cfg = cfg
        self.weight_dict = loss_weight_dict(cfg)

    def __call__(
        self,
        outputs: Dict[str, jnp.ndarray],
        target_boxes: jnp.ndarray,  # (B, T, 4) cxcywh
        inter_idx: jnp.ndarray,  # (B, 2)
        time_mask: jnp.ndarray,  # (B, T) True on valid frames
        num_boxes: Optional[jnp.ndarray] = None,
        mean_scale: float = 1.0,
    ) -> Dict[str, jnp.ndarray]:
        cfg = self.cfg
        t = time_mask.shape[1]
        positive_map = inter_positive_map(inter_idx, t) & time_mask
        if num_boxes is None:
            num_boxes = positive_map.sum().astype(jnp.float32)

        multi_query = "pred_boxes_queries" in outputs

        def match(pred_boxes_q, pred_sted_q):
            """num_queries > 1: Hungarian assignment of the single GT box
            (losses/matcher.py — exact argmin for one target), re-done per
            decoder layer DETR-style; gradients flow through the matched
            prediction only (stop_gradient on the cost, like DETR's no-grad
            matcher). Two granularities (``--nq_match``):

            * ``frame`` (canonical): independent argmin per frame — the
              tightest loss, but different frames of one video may match
              different queries, so no single query learns the whole tube
              (measured: sted query selection lands below chance,
              docs/NOTES.md round 5).
            * ``video``: ONE query per video — argmin of the cost summed
              over the annotated frames (positive_map) — so the matched
              query carries the entire tube and inference-side selection
              (--nq_select sted) has a coherent winner to find.
            """
            import jax

            from tubedetr_tpu.losses.matcher import (
                box_match_cost,
                match_single_target,
            )

            cost = box_match_cost(
                pred_boxes_q, target_boxes,
                cfg.bbox_loss_coef, cfg.giou_loss_coef,
            )  # (B, T, nq)
            cost = jax.lax.stop_gradient(cost)
            if cfg.nq_match == "video":
                cost_v = (cost * positive_map[..., None]).sum(axis=1)
                qi = jnp.broadcast_to(
                    match_single_target(cost_v)[:, None], cost.shape[:2]
                )  # (B, T) — same query on every frame of the video
            else:
                qi = match_single_target(cost)  # (B, T)
            pb = jnp.take_along_axis(
                pred_boxes_q, qi[..., None, None], axis=2
            )[:, :, 0]
            ps = None
            if pred_sted_q is not None:
                ps = jnp.take_along_axis(
                    pred_sted_q, qi[..., None, None], axis=2
                )[:, :, 0]
            return pb, ps, qi

        def objectness_loss(pred_obj_q, qi):
            """BCE on the per-(frame, query) objectness logits against the
            Hungarian match: on each ANNOTATED frame the matched query is
            the positive and every other query a negative (DETR's class
            head specialised to the one-object STVG setting). Frames
            outside the GT moment / padding carry no box, so they are
            excluded; per-frame mean over queries, normalized by the same
            global ``num_boxes`` as the box losses."""
            nq = pred_obj_q.shape[-1]
            onehot = (
                qi[..., None] == jnp.arange(nq)[None, None, :]
            ).astype(pred_obj_q.dtype)  # (B, T, nq)
            # numerically-stable sigmoid BCE: max(x,0) - x*z + log1p(exp(-|x|))
            x = pred_obj_q
            bce = jnp.maximum(x, 0.0) - x * onehot + jnp.log1p(
                jnp.exp(-jnp.abs(x))
            )
            w = positive_map.astype(bce.dtype)
            per_frame = bce.mean(-1)  # (B, T)
            return {
                "loss_objectness": (per_frame * w).sum()
                / jnp.maximum(num_boxes, 1.0)
            }

        def layer_losses(pred_boxes, pred_sted, weights):
            d = loss_boxes(pred_boxes, target_boxes, positive_map, num_boxes)
            # gradient accumulation (parallel/train_step.py): the box /
            # objectness losses become big-batch-exact through the global
            # ``num_boxes`` override alone (summing microbatch terms over a
            # shared denominator); the batch-MEAN losses (sted, guided-attn)
            # instead need each microbatch mean scaled by 1/grad_accum so
            # the microbatch SUM equals the big-batch mean
            if cfg.sted and pred_sted is not None:
                d.update({
                    k: v * mean_scale for k, v in
                    loss_sted(pred_sted, inter_idx, time_mask,
                              cfg.sigma).items()
                })
            if cfg.guided_attn and weights is not None:
                d.update({
                    k: v * mean_scale for k, v in
                    loss_guided_attn(weights, positive_map,
                                     time_mask).items()
                })
            return d

        if multi_query:
            pb, ps, qi = match(
                outputs["pred_boxes_queries"],
                outputs.get("pred_sted_queries"),
            )
            losses = layer_losses(pb, ps, outputs.get("weights"))
            if "pred_obj_queries" in outputs:
                losses.update(
                    objectness_loss(outputs["pred_obj_queries"], qi)
                )
        else:
            losses = layer_losses(
                outputs["pred_boxes"],
                outputs.get("pred_sted"),
                outputs.get("weights"),
            )
        if cfg.aux_loss and "aux_pred_boxes" in outputs:
            n_aux = outputs["aux_pred_boxes"].shape[0]
            for i in range(n_aux):
                if multi_query:
                    pb, ps, qi = match(
                        outputs["aux_pred_boxes_queries"][i],
                        outputs.get("aux_pred_sted_queries")[i]
                        if cfg.sted
                        else None,
                    )
                    d = layer_losses(
                        pb, ps,
                        outputs.get("aux_weights")[i]
                        if cfg.guided_attn
                        else None,
                    )
                    if "aux_pred_obj_queries" in outputs:
                        d.update(objectness_loss(
                            outputs["aux_pred_obj_queries"][i], qi
                        ))
                else:
                    d = layer_losses(
                        outputs["aux_pred_boxes"][i],
                        outputs.get("aux_pred_sted")[i] if cfg.sted else None,
                        outputs.get("aux_weights")[i]
                        if cfg.guided_attn
                        else None,
                    )
                losses.update({f"{k}_{i}": v for k, v in d.items()})
        return losses

    def total(self, losses: Dict[str, jnp.ndarray]) -> jnp.ndarray:
        return sum(
            losses[k] * w for k, w in self.weight_dict.items() if k in losses
        )
