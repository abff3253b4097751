"""Golden loss parity: our mask-based SetCriterion vs the reference's
gather-based SetCriterion (+ the engine's keep-slicing), including aux
layers, ragged durations, and an empty-intersection video.

The reference slices predictions to in-moment frames with a Python-built
``keep`` index (/root/reference/engine.py:83-110) and concatenates per-frame
target boxes; ours keeps static (B, T) grids and weights by the positive
map. Same math — verified here end-to-end on random tensors.
"""

import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp  # noqa: E402

from tests.test_layer_parity import REF, _stub  # noqa: E402
from tubedetr_tpu.config import TubeDETRConfig  # noqa: E402
from tubedetr_tpu.losses.criterion import SetCriterion  # noqa: E402


@pytest.fixture(scope="module")
def ref_criterion_cls():
    if "hostlist" not in sys.modules:
        _stub("hostlist")
    if "torchvision" not in sys.modules:
        tv = _stub("torchvision")
        tv_ops = _stub("torchvision.ops")
        tv_boxes = _stub("torchvision.ops.boxes")
        tv_boxes.box_area = lambda b: (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
        tv_ops.boxes = tv_boxes
        tv.ops = tv_ops
        tv_models = _stub("torchvision.models")
        tv_models_utils = _stub("torchvision.models._utils")
        tv_models_utils.IntermediateLayerGetter = object
        tv_models._utils = tv_models_utils
        tv.models = tv_models
    if "timm" not in sys.modules:
        timm = _stub("timm")
        timm_models = _stub("timm.models")
        timm_models.create_model = lambda *a, **k: None
        timm.models = timm_models
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.tubedetr import SetCriterion as RefCriterion

    return RefCriterion


def test_criterion_matches_reference(ref_criterion_cls):
    rng = np.random.RandomState(0)
    b, t, n_aux = 2, 7, 2
    sigma = 1

    durations = np.array([7, 5])
    inter_idx = np.array([[1, 4], [0, 3]])
    time_mask = np.arange(t)[None] < durations[:, None]

    sig = lambda x: 1 / (1 + np.exp(-x))
    pred_boxes = sig(rng.randn(b, t, 4)).astype(np.float32) * 0.5 + 0.2
    pred_sted = rng.randn(b, t, 2).astype(np.float32)
    weights = (sig(rng.randn(b, t, t)) * 0.6).astype(np.float32)
    target_boxes = (sig(rng.randn(b, t, 4)) * 0.4 + 0.25).astype(np.float32)
    aux_boxes = sig(rng.randn(n_aux, b, t, 4)).astype(np.float32) * 0.5 + 0.2
    aux_sted = rng.randn(n_aux, b, t, 2).astype(np.float32)
    aux_w = (sig(rng.randn(n_aux, b, t, t)) * 0.6).astype(np.float32)

    # ---- reference: keep-sliced flat inputs ---------------------------
    def keep_slice(arr):  # (B, T, 4) -> (num_kept, 4) in engine order
        rows = []
        for i in range(b):
            s, e = inter_idx[i]
            rows.append(arr[i, s : e + 1])
        return np.concatenate(rows, axis=0)

    ref_outputs = {
        "pred_boxes": torch.from_numpy(keep_slice(pred_boxes)),
        "pred_sted": torch.from_numpy(pred_sted),
        "weights": torch.from_numpy(weights),
        "aux_outputs": [
            {
                "pred_boxes": torch.from_numpy(keep_slice(aux_boxes[i])),
                "pred_sted": torch.from_numpy(aux_sted[i]),
                "weights": torch.from_numpy(aux_w[i]),
            }
            for i in range(n_aux)
        ],
    }
    ref_targets = [
        {"boxes": torch.from_numpy(target_boxes[i, s : e + 1])}
        for i, (s, e) in enumerate(inter_idx)
    ]
    # flatten per-frame targets the way the collate does (one dict per frame)
    flat_targets = []
    for i, (s, e) in enumerate(inter_idx):
        for j in range(s, e + 1):
            flat_targets.append({"boxes": torch.from_numpy(target_boxes[i, j : j + 1])})

    ref_crit = ref_criterion_cls(losses=["boxes", "sted", "guided_attn"], sigma=sigma)
    with torch.no_grad():
        ref_losses = ref_crit(
            ref_outputs,
            flat_targets,
            inter_idx=[list(x) for x in inter_idx],
            time_mask=torch.from_numpy(time_mask),
        )

    # ---- ours: static grids + masks -----------------------------------
    cfg = TubeDETRConfig(
        dec_layers=n_aux + 1, aux_loss=True, guided_attn=True, sted=True,
        sigma=sigma,
    )
    ours = SetCriterion(cfg)
    our_losses = ours(
        {
            "pred_boxes": jnp.asarray(pred_boxes),
            "pred_sted": jnp.asarray(pred_sted),
            "weights": jnp.asarray(weights),
            "aux_pred_boxes": jnp.asarray(aux_boxes),
            "aux_pred_sted": jnp.asarray(aux_sted),
            "aux_weights": jnp.asarray(aux_w),
        },
        jnp.asarray(target_boxes),
        jnp.asarray(inter_idx),
        jnp.asarray(time_mask),
    )

    assert set(ref_losses) == set(our_losses)
    for k in sorted(ref_losses):
        np.testing.assert_allclose(
            float(our_losses[k]), float(ref_losses[k]), rtol=2e-5,
            err_msg=k,
        )


def test_criterion_empty_intersection_matches(ref_criterion_cls):
    """A video whose clip misses the moment ([-100,-100]) contributes no box
    loss in either implementation (the reference's engine skips it from
    keep; sted/guided-attn still count it)."""
    rng = np.random.RandomState(1)
    b, t = 2, 5
    durations = np.array([5, 4])
    inter_idx = np.array([[1, 3], [-100, -100]])
    time_mask = np.arange(t)[None] < durations[:, None]
    sig = lambda x: 1 / (1 + np.exp(-x))
    pred_boxes = sig(rng.randn(b, t, 4)).astype(np.float32) * 0.5 + 0.2
    pred_sted = rng.randn(b, t, 2).astype(np.float32)
    weights = (sig(rng.randn(b, t, t)) * 0.6).astype(np.float32)
    target_boxes = (sig(rng.randn(b, t, 4)) * 0.4 + 0.25).astype(np.float32)

    ref_outputs = {
        "pred_boxes": torch.from_numpy(pred_boxes[0, 1:4]),
        "pred_sted": torch.from_numpy(pred_sted),
        "weights": torch.from_numpy(weights),
    }
    flat_targets = [
        {"boxes": torch.from_numpy(target_boxes[0, j : j + 1])} for j in (1, 2, 3)
    ]
    ref_crit = ref_criterion_cls(losses=["boxes", "sted", "guided_attn"], sigma=1)
    with torch.no_grad():
        ref_losses = ref_crit(
            ref_outputs,
            flat_targets,
            inter_idx=[[1, 3], [-100, -100]],
            time_mask=torch.from_numpy(time_mask),
        )

    cfg = TubeDETRConfig(dec_layers=1, aux_loss=False, guided_attn=True, sted=True)
    ours = SetCriterion(cfg)
    our_losses = ours(
        {
            "pred_boxes": jnp.asarray(pred_boxes),
            "pred_sted": jnp.asarray(pred_sted),
            "weights": jnp.asarray(weights),
        },
        jnp.asarray(target_boxes),
        jnp.asarray(inter_idx),
        jnp.asarray(time_mask),
    )
    for k in ("loss_bbox", "loss_giou", "loss_sted", "loss_guided_attn"):
        np.testing.assert_allclose(
            float(our_losses[k]), float(ref_losses[k]), rtol=2e-5, err_msg=k
        )
