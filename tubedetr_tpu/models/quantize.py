"""Shared PTQ calibration utilities for the int8 backbone paths.

One home for the "build the dynamic-observer model, run one forward with
``mutable=['qscales']``, merge the recorded activation maxima" flow that the
eval CLI, the training fast-pass, serving and bench all need — previously
copy-pasted at each site (round-2 review finding).

Also: persistence. Calibration costs a full extra compile of the observer
model (~10 min cold over the remote tunnel), so the calibrated scales are
saved to a sidecar ``.npz`` keyed by (quantization-relevant config, weights
tag) and loaded on subsequent startups — matching the reference's
load-and-serve-immediately behavior (/root/reference/server_stvg.py:90-140;
the reference has no quantization and therefore no calibration cost at all).
"""

from __future__ import annotations

import hashlib
import json
import os
from typing import Dict, Optional, Tuple

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
            f"(no int8 path)"
        )
    qscales = jax.tree_util.tree_map(np.asarray, upd["qscales"])
    return allreduce_max_tree(qscales)


def allreduce_max_tree(qscales: Dict) -> Dict:
    """Max-reduce an activation-maxima tree across processes so every rank
    bakes identical static scales (no-op single-process)."""
    import jax

    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        from tubedetr_tpu.parallel.dist import barrier

        barrier("calibrate_qscales")
        gathered = multihost_utils.process_allgather(qscales)
        qscales = jax.tree_util.tree_map(
            lambda g: np.max(np.asarray(g), axis=0), gathered
        )
    return qscales


# ---------------------------------------------------------------------------
# persistence: sidecar save/load + config-keyed cache
# ---------------------------------------------------------------------------

# config fields that change the quantized graph or the activation ranges the
# observers see; anything else (ports, paths, LRs...) must not invalidate a
# cached calibration
_QUANT_CFG_FIELDS = (
    "backbone",
    "dilation",
    "backbone_quant",
    "backbone_quant_fast",
    "backbone_quant_frozen",
    "fused_bottleneck",
    "scan_backbone_blocks",
    "share_backbone_inference",
    "compute_dtype",
    "resolution",
    "video_max_len",
    "video_max_len_train",
    "stride",
    "fast",
    "fast_mode",
    "space_to_depth_stem",
)


def qscales_cache_key(cfg, weights_tag: str = "", data_tag: str = "") -> str:
    """Stable cache key over the quantization-relevant config slice plus a
    caller-supplied weights identity tag (checkpoint path+size+mtime, or a
    fabrication recipe string). Weight VALUES are deliberately not hashed —
    they may live device-side behind a slow tunnel; the tag is the caller's
    promise about which weights are loaded (``--calibrate`` forces a refresh
    when in doubt).

    ``data_tag`` names the calibration data (e.g. the val dataset list):
    scales calibrated on one dataset must not silently serve an eval of
    another. Folded into the key only when non-empty, so callers whose
    calibration data is implied by the config slice (bench's synthetic
    tensors, serving's live requests) keep their existing keys."""
    slice_ = {f: getattr(cfg, f) for f in _QUANT_CFG_FIELDS}
    blob_dict = {"cfg": slice_, "weights": weights_tag}
    if data_tag:
        blob_dict["data"] = data_tag
    blob = json.dumps(blob_dict, sort_keys=True)
    return hashlib.sha256(blob.encode()).hexdigest()[:16]


def file_weights_tag(path: str) -> str:
    """Weights-identity tag for a checkpoint file: abspath + size + mtime —
    cheap, and catches a swapped file at the same path."""
    if path and os.path.exists(path):
        st = os.stat(path)
        return f"{os.path.abspath(path)}:{st.st_size}:{int(st.st_mtime)}"
    return os.path.abspath(path) if path else ""


def weights_tag_for(cfg, default: str = "fabricate-seed0") -> str:
    """Default weights tag: the checkpoint identity when one is configured,
    else ``default``. Callers whose weights are NOT pipeline-fabricated
    (e.g. the train CLI's ``model.init`` weights) must pass a distinct
    ``default`` — otherwise two different weight sets share a cache key."""
    for path in (cfg.resume, cfg.load):
        if path:
            return file_weights_tag(path)
    return default


def _flatten(tree: Dict, prefix: str = "") -> Dict[str, np.ndarray]:
    out = {}
    for k, v in tree.items():
        key = f"{prefix}/{k}" if prefix else str(k)
        if isinstance(v, dict):
            out.update(_flatten(v, key))
        else:
            out[key] = np.asarray(v)
    return out


def _unflatten(flat: Dict[str, np.ndarray]) -> Dict:
    out: Dict = {}
    for key, v in flat.items():
        parts = key.split("/")
        node = out
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = v
    return out


def save_qscales(path: str, qscales: Dict) -> None:
    """Write the calibrated scales tree as a flat .npz (atomic replace)."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    flat = _flatten(qscales)
    tmp = path + ".tmp.npz"
    np.savez(tmp, **flat)
    os.replace(tmp, path)


def load_qscales(path: str) -> Dict:
    with np.load(path) as z:
        return _unflatten({k: z[k] for k in z.files})


def make_drift_checker(cfg):
    """Build a reusable activation-range drift probe for the training int8
    passes (ADVICE r2: the fast-pass consumes evolving layer2-4 weights, so
    scales baked at step 0 can under-cover later epochs). One jitted
    observer forward, compiled once; ``check`` returns the worst
    observed/baked activation-max ratio, its leaf path, and the observed
    maxima tree (host numpy, NOT cross-process reduced — pass it through
    ``allreduce_max_tree`` before baking as fresh scales) — ratios > 1 mean
    the baked scale now clips."""
    import jax

    from tubedetr_tpu.models.tubedetr import build_model

    calib_model = build_model(calibration_cfg(cfg))

    fwd = jax.jit(
        lambda v, b: calib_model.apply(
            v, **b, deterministic=True, mutable=["qscales"]
        )[1]["qscales"]
    )

    def check(variables: Dict, batch_inputs: Dict, baked: Dict):
        observed = jax.tree_util.tree_map(
            np.asarray,
            fwd(
                {
                    k: variables[k]
                    for k in ("params", "buffers")
                    if k in variables
                },
                batch_inputs,
            ),
        )
        flat_o, flat_b = _flatten(observed), _flatten(baked)
        worst, worst_key = 0.0, ""
        for k, o in flat_o.items():
            b = float(np.max(flat_b.get(k, np.zeros(1))))
            if b <= 0:
                continue
            r = float(np.max(o)) / b
            if r > worst:
                worst, worst_key = r, k
        return worst, worst_key, observed

    return check


def get_or_calibrate_qscales(
    cfg,
    variables: Dict,
    batch_inputs: Dict,
    cache_dir: str = "",
    weights_tag: Optional[str] = None,
    force: bool = False,
    data_tag: str = "",
) -> Tuple[Dict, str]:
    """Load calibrated scales from the sidecar cache, or run one observer
    forward and persist the result. Returns ``(qscales, source)`` with
    source in {"cache", "calibrated"}.

    Cold-start motivation: calibration compiles the dynamic-observer model —
    measured ~10 min over the remote TPU tunnel (BENCH_r02 ``int8
    calibration done in 619.1s``) — while the sidecar loads in milliseconds.
    Multi-process: the hit/miss decision is made COLLECTIVELY (a rank whose
    qscales_dir is missing the file must not diverge into the calibration
    collective alone — that deadlocks at process_allgather); all ranks take
    the cache only when every rank has the file. On a miss, the calibrated
    scales are already max-reduced across ranks (``calibrate_qscales``),
    and only process 0 writes.
    """
    import jax

    path = ""
    hit = False
    if cache_dir:
        if weights_tag is None:
            weights_tag = weights_tag_for(cfg)
        key = qscales_cache_key(cfg, weights_tag, data_tag=data_tag)
        path = os.path.join(cache_dir, f"qscales-{key}.npz")
        hit = not force and os.path.exists(path)
    if jax.process_count() > 1:
        from jax.experimental import multihost_utils

        from tubedetr_tpu.parallel.dist import barrier

        barrier("qscales_cache_probe")
        hits = multihost_utils.process_allgather(np.asarray(hit))
        hit = bool(np.all(hits))
    if hit:
        return load_qscales(path), "cache"
    qscales = calibrate_qscales(cfg, variables, batch_inputs)
    if path and jax.process_index() == 0:
        save_qscales(path, qscales)
    return qscales, "calibrated"
