"""Train / evaluation epoch loops.

Equivalent of /root/reference/engine.py, restructured for JAX: the per-step
work (two-phase forward, keep-slicing, criterion, backward, clip, step, EMA)
is one jitted ``train_step``; this module drives it, adjusts LRs per step,
guards NaNs, logs, and feeds the evaluators.
"""

from __future__ import annotations

import math
import sys
from typing import Dict, Iterable

import numpy as np

from tubedetr_tpu.config import TubeDETRConfig, loss_weight_dict
from tubedetr_tpu.models.postprocess import (
    postprocess_boxes,
    postprocess_sted,
    select_query_by_objectness,
    select_query_by_sted,
)
from tubedetr_tpu.train.logging import MetricLogger
from tubedetr_tpu.train.optim import current_lrs


def train_one_epoch(
    cfg: TubeDETRConfig,
    train_step,
    state,
    data_loader: Iterable,
    epoch: int,
    num_training_steps: int,
    writer=None,
) -> tuple:
    """One epoch; returns (state, stats dict).

    NaN guard aborts like the reference (/root/reference/engine.py:142-145).
    """
    logger = MetricLogger(print_freq=100)
    weight_dict = loss_weight_dict(cfg)
    header = f"Epoch: [{epoch}]"
    n_steps_per_epoch = getattr(data_loader, "__len__", lambda: None)()
    # jax.profiler window (TUBEDETR_PROFILE_DIR): first epoch only — one
    # bounded trace per run, not one per epoch
    from tubedetr_tpu.utils.misc import ProfileWindow

    profiler = ProfileWindow(enabled=(epoch == 0))

    for i, (batch, meta) in enumerate(logger.log_every(data_loader, header)):
        profiler.step(i)
        curr_step = epoch * (n_steps_per_epoch or 0) + i
        # The reference adjusts LRs AFTER optimizer.step()
        # (/root/reference/engine.py:149-153), so global step g runs at the
        # schedule value of step g-1 and step 0 at the base LRs.
        if curr_step == 0:
            lrs = {
                "lr": cfg.lr,
                "lr_backbone": cfg.lr_backbone,
                "lr_text_encoder": cfg.text_encoder_lr,
            }
        else:
            prev_epoch = epoch if i > 0 else epoch - 1
            lrs = current_lrs(cfg, prev_epoch, curr_step - 1, num_training_steps)
        if i == 0:
            import jax

            if jax.process_count() > 1:
                # align ranks immediately before the first step: the step's
                # gradient psum is the FIRST collective, and per-rank
                # compile skew (minutes) would otherwise blow the backend
                # collective timeout (~30 s). Entering compilation
                # simultaneously (same program, shared persistent cache)
                # keeps the residual skew within it.
                from tubedetr_tpu.parallel.dist import barrier

                barrier(f"train_first_step_e{epoch}")
        state, metrics = train_step(
            state,
            batch,
            {k: np.float32(v) for k, v in lrs.items()},
            np.int32(cfg.seed),
        )
        loss_value = float(metrics["loss_total"])
        if not math.isfinite(loss_value):
            print(f"Loss is {loss_value}, stopping training")
            print({k: float(v) for k, v in metrics.items()})
            sys.exit(1)
        logger.update(
            loss=loss_value,
            lr=lrs["lr"],
            lr_backbone=lrs["lr_backbone"],
            lr_text_encoder=lrs["lr_text_encoder"],
            **{
                k: float(v)
                for k, v in metrics.items()
                if k in weight_dict or k.endswith("_unscaled")
            },
        )
        if writer is not None and i % 100 == 0:
            for k, v in metrics.items():
                try:
                    writer.add_scalar(k, float(v), curr_step)
                except Exception:
                    pass
    profiler.close()  # stop a window the epoch was too short to finish
    from tubedetr_tpu.parallel.dist import sync_meters_between_processes

    sync_meters_between_processes(logger.meters)
    stats = {k: m.global_avg for k, m in logger.meters.items()}
    return state, stats


def _maybe_log_qsel(qsel, outputs, batch, meta):
    """Selection-accuracy instrumentation for ``--nq_select sted``
    (env-gated: ``TUBEDETR_QSEL_LOG=<path>`` appends one JSON line per
    clip). For each annotated frame, the "right" query is the one the
    training criterion would match (argmin of the DETR box cost vs the GT
    box — losses/matcher.py); agreement is the fraction of those frames
    whose matched query equals the sted-selected winner."""
    import json
    import os

    path = os.environ.get("TUBEDETR_QSEL_LOG")
    if not path or "target_boxes" not in batch:
        return
    from tubedetr_tpu.losses.matcher import box_match_cost

    pred_q = np.asarray(outputs["pred_boxes_queries"])  # (B, T, nq, 4)
    tgt = np.asarray(batch["target_boxes"])  # (B, T, 4)
    inter = np.asarray(batch["inter_idx"])  # (B, 2)
    cost = np.asarray(box_match_cost(pred_q, tgt))  # (B, T, nq)
    matched = cost.argmin(-1)  # (B, T)
    qsel = np.asarray(qsel)
    per_frame_sel = qsel.ndim == 2  # --nq_select objectness: (B, T) winners
    with open(path, "a") as f:
        for i in range(qsel.shape[0]):
            s0, e0 = int(inter[i, 0]), int(inter[i, 1])
            if s0 < 0:
                continue
            frames = matched[i, s0 : e0 + 1]
            # the --nq_match video assignment for this clip: one argmin of
            # the summed annotated-frame cost (losses/criterion.py match())
            video_q = int(cost[i, s0 : e0 + 1].sum(0).argmin())
            if per_frame_sel:
                sel = qsel[i, s0 : e0 + 1]
                row = {
                    "selected": [int(q) for q in sel],
                    "agreement": float((frames == sel).mean()),
                    "video_agreement": float(
                        (sel == video_q).mean()
                    ),
                }
            else:
                row = {
                    "selected": int(qsel[i]),
                    "agreement": float((frames == int(qsel[i])).mean()),
                    "video_agreement": float(video_q == int(qsel[i])),
                }
            f.write(json.dumps({
                "video_id": str(meta["video_ids"][i]),
                "matched": [int(q) for q in frames],
                "matched_video": video_q,
                **row,
            }) + "\n")


def evaluate(
    cfg: TubeDETRConfig,
    eval_step,
    state,
    data_loader: Iterable,
    evaluator=None,
    dataset_name: str = "vidstg",
    test_mode: bool = False,
) -> Dict:
    """Evaluation epoch (/root/reference/engine.py:178-421): run the model,
    postprocess boxes to pixels and sted logits to segments, feed the vIoU
    evaluator. ``test_mode`` additionally stores attention weights."""
    logger = MetricLogger(print_freq=100)
    padded_losses = []
    for batch, meta in logger.log_every(data_loader, "Eval:"):
        outputs, losses = eval_step(state, batch)
        outputs = {k: np.asarray(v) for k, v in outputs.items()}

        durations = np.asarray(batch["durations"])
        time_mask = np.asarray(batch["time_mask"])
        inter = np.asarray(batch["inter_idx"])
        # ragged eval batches are PADDED to a static size (the train CLI
        # repeats the last sample); meta keeps the real length — slice the
        # padded tail away before feeding the evaluator
        b = durations.shape[0]
        padded = (
            meta.get("video_ids") is not None and len(meta["video_ids"]) < b
        )
        if padded:
            b = len(meta["video_ids"])
            durations, time_mask, inter = (
                durations[:b], time_mask[:b], inter[:b]
            )
            outputs = {k: v[:b] for k, v in outputs.items()}
        if losses and not padded:
            # the jitted step averages losses over the PADDED batch, so a
            # padded tail would count its repeated last sample multiple
            # times; skip the meter update for those (metrics come from the
            # evaluator, which sees only the sliced real samples)
            logger.update(
                **{k: float(v) for k, v in losses.items() if np.ndim(v) == 0}
            )
        elif losses and padded:
            # remember padded-batch losses: if EVERY batch is padded (tiny
            # val set under pad-to-static-batch), the meters would otherwise
            # end empty while vIoU metrics still appear (ADVICE r2)
            padded_losses.append(
                {k: float(v) for k, v in losses.items() if np.ndim(v) == 0}
            )

        if evaluator is None:
            continue

        if (
            cfg.num_queries > 1
            and cfg.nq_select == "sted"
            and "pred_sted_queries" in outputs
        ):
            # rank queries by their own sted confidence and read the winner
            # (per video) instead of the canonical query 0
            qsel = select_query_by_sted(
                outputs["pred_sted_queries"], time_mask, meta["video_ids"]
            )
            _maybe_log_qsel(qsel, outputs, batch, meta)
            idx = qsel[:, None, None, None]
            outputs = dict(outputs)
            outputs["pred_boxes"] = np.take_along_axis(
                outputs["pred_boxes_queries"], idx, axis=2
            )[:, :, 0]
            outputs["pred_sted"] = np.take_along_axis(
                outputs["pred_sted_queries"], idx, axis=2
            )[:, :, 0]
        elif (
            cfg.num_queries > 1
            and cfg.nq_select == "objectness"
            and "pred_obj_queries" in outputs
        ):
            # per-FRAME readout from the learned objectness head — each
            # frame reads the query the head scores highest there, the
            # exact per-frame Hungarian-match composite the training
            # losses supervise (losses/criterion.py match()/
            # objectness_loss; models/postprocess.py docstring)
            qsel = select_query_by_objectness(
                outputs["pred_obj_queries"], time_mask
            )  # (B, T)
            _maybe_log_qsel(qsel, outputs, batch, meta)
            idx = qsel[:, :, None, None]
            outputs = dict(outputs)
            outputs["pred_boxes"] = np.take_along_axis(
                outputs["pred_boxes_queries"], idx, axis=2
            )[:, :, 0]
            if "pred_sted_queries" in outputs:
                outputs["pred_sted"] = np.take_along_axis(
                    outputs["pred_sted_queries"], idx, axis=2
                )[:, :, 0]

        # per-frame boxes -> pixel xyxy, keyed "videoid_frameid"
        preds = {}
        for i in range(b):
            vid = meta["video_ids"][i]
            oh, ow = meta["orig_sizes"][i]
            boxes = postprocess_boxes(
                outputs["pred_boxes"][i], np.array([oh, ow])
            )  # (T, 4)
            s0, e0 = inter[i]
            frames = meta["frames_id"][i]
            if s0 < 0 and not test_mode:
                continue  # skip empty-intersection clips (engine.py:230-240)
            lo = 0 if test_mode else int(s0)
            hi = int(durations[i]) if test_mode else int(e0) + 1
            for j in range(lo, min(hi, len(frames))):
                preds[f"{vid}_{frames[j]}"] = {"boxes": [boxes[j].tolist()]}
        evaluator.update(preds)

        # per-video sted segments (with clip ensembling on duplicate ids)
        if cfg.sted and "pred_sted" in outputs:
            steds = postprocess_sted(
                outputs["pred_sted"],
                meta["frames_id"],
                meta["video_ids"],
                time_mask,
            )
            seen = set()
            vp = {}
            for i, vid in enumerate(meta["video_ids"]):
                if vid in seen:
                    continue
                seen.add(vid)
                vp[vid] = {
                    "sted": steds[len(vp)],
                    "qtype": meta["qtypes"][i],
                }
            evaluator.video_update(vp)

        if test_mode and "weights" in outputs and hasattr(evaluator, "save"):
            # split cross-attn into text vs spatial parts
            ca = outputs["ca_weights"]  # (B, T, hw+L)
            hw = ca.shape[-1] - np.asarray(batch["text_pad_mask"]).shape[-1]
            evaluator.save(
                outputs["weights"],
                ca[..., hw:],
                ca[..., :hw],
                outputs["pred_sted"],
                meta["video_ids"],
            )
    if padded_losses and not logger.meters:
        # every batch was padded (tiny val set): report the padded-batch
        # losses rather than none at all. They over-weight each batch's
        # repeated last sample — flagged as such (ADVICE r2).
        print(
            "[eval] all batches were padded; loss meters use padded-batch "
            "averages (repeated tail samples over-weighted)"
        )
        for pl in padded_losses:
            logger.update(**pl)
    from tubedetr_tpu.parallel.dist import sync_meters_between_processes

    sync_meters_between_processes(logger.meters)
    stats = {k: m.global_avg for k, m in logger.meters.items()}
    return stats
