"""Shared PTQ calibration utilities for the int8 backbone paths.

One home for the "build the dynamic-observer model, run one forward with
``mutable=['qscales']``, merge the recorded activation maxima" flow that the
eval CLI, the training fast-pass, serving and bench all need — previously
copy-pasted at each site (round-2 review finding).
"""

from __future__ import annotations

from typing import Dict

import numpy as np


def calibration_cfg(cfg):
    """The dynamic-observer twin of ``cfg``: int8 modes become "int8"
    (observe + dynamic scales) and, when the fast-pass is quantized, the
    two-pass forward is forced so the fast trunk actually executes."""
    out = cfg
    if cfg.backbone_quant != "none":
        out = out.replace(backbone_quant="int8")
    if cfg.backbone_quant_fast != "none":
        out = out.replace(
            backbone_quant_fast="int8", share_backbone_inference=False
        )
    if cfg.backbone_quant_frozen != "none":
        # the frozen-prefix observers live in the two-pass slow pathway
        out = out.replace(
            backbone_quant_frozen="int8", share_backbone_inference=False
        )
    return out


def calibrate_qscales(cfg, variables: Dict, batch_inputs: Dict) -> Dict:
    """One observer forward on ``batch_inputs`` -> host qscales tree.

    Multi-process: every process calibrates on ITS batch (the loaders are
    process-sharded), then the per-leaf activation maxima are max-reduced
    across processes so every rank bakes the SAME static scales into its
    executable — otherwise each rank would eval/train a numerically
    different quantized model (review finding; the reference has no
    quantization, but its analogous cross-rank reductions are
    /root/reference/util/dist.py:98-122).
    """
    import jax

    from tubedetr_tpu.models.tubedetr import build_model

    calib_model = build_model(calibration_cfg(cfg))
    _, upd = jax.jit(
        lambda v, b: calib_model.apply(
            v, **b, deterministic=True, mutable=["qscales"]
        )
    )({k: variables[k] for k in ("params", "buffers") if k in variables},
      batch_inputs)
    if "qscales" not in upd:
        raise ValueError(
            f"backbone {cfg.backbone!r} recorded no quantization observers "
            f"(no int8 path); backbone_quant/-_fast support the resnet "
            f"family only"
        )
    qscales = jax.tree_util.tree_map(np.asarray, upd["qscales"])
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        from tubedetr_tpu.parallel.dist import barrier

        barrier("calibrate_qscales")
        gathered = multihost_utils.process_allgather(qscales)
        qscales = jax.tree_util.tree_map(
            lambda g: np.max(np.asarray(g), axis=0), gathered
        )
    return qscales
