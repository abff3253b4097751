"""Bisect the backbone grad mismatch: run the JAX-vs-torch grad comparison
over variants (fast on/off, ragged on/off, share_backbone_train on/off) and
print the backbone median relnorm for each.
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/diag_grad_variants.py
"""
import sys

sys.path.insert(0, "/root/repo")

import tempfile

import numpy as np

import tests.test_grad_parity as tg
from tests.test_full_model_parity import T, build_reference_model, tiny_cfg


def run_case(fast: bool, durations, share_train: bool):
    import jax
    import torch

    from tubedetr_tpu.interop.torch_convert import convert_tubedetr
    from tubedetr_tpu.models.tubedetr import build_model
    from tubedetr_tpu.train.checkpoint import load_torch_checkpoint_into
    from tubedetr_tpu.train.optim import mask_frozen_grads
    from tubedetr_tpu.parallel.train_step import create_train_state

    inter_idx = [[1, 4], [0, 2]][: len(durations)]
    ref = build_reference_model(fast=fast)
    rng = np.random.RandomState(11)
    frames_np = [
        rng.randn(dur, tg.RES, tg.RES, 3).astype(np.float32) * 0.5
        for dur in durations
    ]
    captions = ["a man riding a horse", "a dog jumping"][: len(durations)]
    b = len(durations)
    sig = 1 / (1 + np.exp(-rng.randn(b, T, 4).astype(np.float32)))
    target_np = (sig * 0.4 + 0.25).astype(np.float32)
    for i, (s, e) in enumerate(inter_idx):
        mask = np.ones(T, bool)
        mask[s : e + 1] = False
        target_np[i, mask] = 0.0

    tmp = tempfile.mkdtemp()
    ckpt_path = f"{tmp}/checkpoint.pth"
    torch.save({"model_ema": ref.state_dict(), "epoch": 0, "args": {}},
               ckpt_path)

    cfg = tiny_cfg(fast=fast).replace(
        lr=tg.LR, lr_backbone=tg.LR_BACKBONE, text_encoder_lr=tg.LR_TEXT,
        weight_decay=tg.WD, clip_max_norm=tg.MAX_NORM, ema=True,
        ema_decay=tg.EMA_DECAY, freeze_text_encoder=True, optimizer="adam",
        sigma=tg.SIGMA, share_backbone_train=share_train,
    )
    ref_res = tg._reference_train_step(
        ref, frames_np, durations, captions, target_np, inter_idx, cfg
    )

    model = build_model(cfg)
    batch = tg._our_batch(cfg, frames_np, durations, captions)
    batch["target_boxes"] = target_np
    batch["inter_idx"] = np.asarray(inter_idx, np.int32)
    batch["time_mask"] = np.arange(T)[None] < np.asarray(durations)[:, None]
    variables = model.init(jax.random.PRNGKey(0), **{
        k: v for k, v in batch.items()
        if k not in ("target_boxes", "inter_idx", "time_mask")
    })
    variables, _ = load_torch_checkpoint_into(variables, ckpt_path, cfg)
    _, _, labels = create_train_state(cfg, variables)
    grad_params, _ = convert_tubedetr(ref_res["grad_sd"], cfg)

    def loss_fn(params):
        from tubedetr_tpu.losses.criterion import SetCriterion
        from tubedetr_tpu.parallel.train_step import model_inputs

        outputs = model.apply(
            {"params": params, "buffers": variables.get("buffers", {})},
            **model_inputs(batch), deterministic=True, train=True,
        )
        crit = SetCriterion(cfg)
        losses = crit(outputs, batch["target_boxes"], batch["inter_idx"],
                      batch["time_mask"])
        return crit.total(losses)

    grads = mask_frozen_grads(jax.grad(loss_fn)(variables["params"]), labels)
    fg, fw = tg._flat(grads), tg._flat(grad_params)
    rels = {}
    for k in sorted(fg):
        a, w = fg[k].astype(np.float64), fw[k].astype(np.float64)
        nw = np.linalg.norm(w)
        if nw < 1e-7:
            continue
        rels[k] = np.linalg.norm(a - w) / nw
    bb = [v for k, v in rels.items() if k.startswith("backbone")]
    other = [v for k, v in rels.items() if not k.startswith("backbone")]
    return (np.median(bb) if bb else float("nan"),
            max(bb) if bb else float("nan"), max(other))


def main():
    cases = [
        ("fast+ragged+share", True, [T, 5], True),
        ("fast+ragged+noshare", True, [T, 5], False),
        ("fast+full+share", True, [T, T], True),
        ("nofast+ragged", False, [T, 5], True),
    ]
    for name, fast, durs, share in cases:
        med, mx, other = run_case(fast, durs, share)
        print(f"{name:24s} backbone relnorm median={med:.2e} max={mx:.2e} "
              f"non-backbone max={other:.2e}", flush=True)


if __name__ == "__main__":
    main()
