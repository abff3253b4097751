"""Is the 20% backbone-grad disagreement semantics or f32 conditioning?
Compare the TORCH reference's own grads computed at float32 vs float64 on the
identical step. If torch-f32 vs torch-f64 shows the same ~0.2 relnorm, the
f32 gradient itself is ill-conditioned and our JAX-vs-torch gap is at the
noise floor.
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/diag_grad_noise_floor.py
"""
import sys

sys.path.insert(0, "/root/repo")

import copy

import numpy as np
import torch

import tests.test_grad_parity as tg
from tests.test_full_model_parity import T, build_reference_model, tiny_cfg


def grads_at(ref, dtype, frames_np, durations, captions, target_np, inter_idx, cfg):
    """tg._reference_train_step's forward+backward, at a chosen dtype."""
    if tg.REF not in sys.path:
        sys.path.insert(0, tg.REF)

    model = copy.deepcopy(ref).to(dtype)
    criterion = tg._build_ref_criterion()
    weight_dict = tg._ref_weight_dict(cfg)
    # the reference allocates default-dtype temporaries internally
    # (e.g. torch.zeros for fast_src, tubedetr.py:160)
    prev_default = torch.get_default_dtype()
    torch.set_default_dtype(dtype)
    try:
        return _grads_body(model, criterion, weight_dict, dtype, frames_np,
                           durations, captions, target_np, inter_idx)
    finally:
        torch.set_default_dtype(prev_default)


def _grads_body(model, criterion, weight_dict, dtype, frames_np, durations,
                captions, target_np, inter_idx):
    from util.misc import NestedTensor

    clips = [
        torch.from_numpy(f.transpose(3, 0, 1, 2)).to(dtype) for f in frames_np
    ]
    slow = [c[:, ::tg.STRIDE] for c in clips]
    samples = NestedTensor.from_tensor_list(slow)
    samples_fast = NestedTensor.from_tensor_list(clips)
    cache = model(samples, durations, captions, encode_and_save=True,
                  samples_fast=samples_fast)
    out = model(samples, durations, captions, encode_and_save=False,
                memory_cache=cache)

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

    targets = []
    for i, (s, e) in enumerate(inter_idx):
        for j in range(s, e + 1):
            targets.append(
                {"boxes": torch.from_numpy(target_np[i, j : j + 1]).to(dtype)}
            )
    time_mask = torch.zeros(b, out["pred_sted"].shape[1], dtype=torch.bool)
    for i_dur, duration in enumerate(durations):
        time_mask[i_dur, :duration] = True

    loss_dict = criterion(out, targets,
                          inter_idx=[list(x) for x in inter_idx],
                          time_mask=time_mask)
    losses = sum(loss_dict[k] * weight_dict[k]
                 for k in loss_dict if k in weight_dict)
    model.zero_grad()
    losses.backward()
    grads = {}
    for n, p in model.named_parameters():
        if p.grad is not None:
            grads[n] = p.grad.detach().double().numpy()
    return grads


def main():
    durations = [T, 5]
    inter_idx = [[1, 4], [0, 2]]
    ref = build_reference_model(fast=True)
    rng = np.random.RandomState(11)
    frames_np = [
        rng.randn(dur, tg.RES, tg.RES, 3).astype(np.float32) * 0.5
        for dur in durations
    ]
    captions = ["a man riding a horse", "a dog jumping"]
    sig = 1 / (1 + np.exp(-rng.randn(2, T, 4).astype(np.float32)))
    target_np = (sig * 0.4 + 0.25).astype(np.float32)
    for i, (s, e) in enumerate(inter_idx):
        mask = np.ones(T, bool)
        mask[s : e + 1] = False
        target_np[i, mask] = 0.0

    cfg = tiny_cfg(fast=True).replace(
        lr=tg.LR, lr_backbone=tg.LR_BACKBONE, text_encoder_lr=tg.LR_TEXT,
        weight_decay=tg.WD, clip_max_norm=tg.MAX_NORM, ema=True,
        ema_decay=tg.EMA_DECAY, freeze_text_encoder=True, optimizer="adam",
        sigma=tg.SIGMA,
    )
    g32 = grads_at(ref, torch.float32, frames_np, durations, captions,
                   target_np, inter_idx, cfg)
    g64 = grads_at(ref, torch.float64, frames_np, durations, captions,
                   target_np, inter_idx, cfg)

    print(f"{'leaf':55s} {'relnorm f32-vs-f64':>18s}")
    rows = []
    for k in sorted(g32):
        a, b = g32[k], g64[k]
        nb = np.linalg.norm(b)
        if nb == 0 and np.linalg.norm(a) == 0:
            continue
        rel = np.linalg.norm(a - b) / (nb + 1e-30)
        rows.append((rel, k))
    rows.sort(reverse=True)
    for rel, k in rows[:25]:
        print(f"{k:55s} {rel:18.2e}")
    body = [r for r, k in rows if "body" in k or "backbone" in k]
    print(f"\nbackbone leaves: n={len(body)} median relnorm="
          f"{np.median(body):.2e} max={max(body):.2e}" if body else "no backbone leaves")


if __name__ == "__main__":
    main()
