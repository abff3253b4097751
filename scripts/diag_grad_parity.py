"""Diagnose the grad-parity mismatch: per-leaf norm-relative error + the
knife-edge (ReLU threshold) hypothesis. Run on CPU:
  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu python scripts/diag_grad_parity.py
"""
import sys

sys.path.insert(0, "/root/repo")

import numpy as np

import tests.test_grad_parity as tg
from tests.test_full_model_parity import T, build_reference_model, tiny_cfg


def main():
    import copy
    import tempfile

    import jax
    import jax.numpy as jnp
    import torch

    from tubedetr_tpu.interop.torch_convert import convert_tubedetr
    from tubedetr_tpu.models.tubedetr import build_model
    from tubedetr_tpu.parallel.train_step import create_train_state, make_train_step

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

    tmp = tempfile.mkdtemp()
    ckpt_path = f"{tmp}/checkpoint.pth"
    torch.save({"model_ema": ref.state_dict(), "epoch": 0, "args": {}}, ckpt_path)

    cfg = tiny_cfg(fast=True).replace(
        lr=tg.LR, lr_backbone=tg.LR_BACKBONE, text_encoder_lr=tg.LR_TEXT,
        weight_decay=tg.WD, clip_max_norm=tg.MAX_NORM, ema=True,
        ema_decay=tg.EMA_DECAY, freeze_text_encoder=True, optimizer="adam",
        sigma=tg.SIGMA,
    )
    ref_res = tg._reference_train_step(
        ref, frames_np, durations, captions, target_np, inter_idx, cfg
    )

    from tubedetr_tpu.train.checkpoint import load_torch_checkpoint_into
    from tubedetr_tpu.train.optim import mask_frozen_grads

    model = build_model(cfg)
    batch = tg._our_batch(cfg, frames_np, durations, captions)
    batch["target_boxes"] = target_np
    batch["inter_idx"] = np.asarray(inter_idx, np.int32)
    batch["time_mask"] = np.arange(T)[None] < np.asarray(durations)[:, None]
    variables = model.init(jax.random.PRNGKey(0), **{
        k: v for k, v in batch.items()
        if k not in ("target_boxes", "inter_idx", "time_mask")
    })
    variables, report = load_torch_checkpoint_into(variables, ckpt_path, cfg)

    state, tx, labels = create_train_state(cfg, variables)
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

    print(f"{'leaf':60s} {'max|ref|':>10s} {'max|diff|':>10s} {'relnorm':>9s} "
          f"{'n>5e-5':>7s} {'refzero':>7s}")
    worst = []
    for k in sorted(fg):
        a, b = fg[k].astype(np.float64), fw[k].astype(np.float64)
        d = np.abs(a - b)
        nb = np.linalg.norm(b)
        rel = np.linalg.norm(a - b) / (nb + 1e-30)
        viol = int((d > 5e-5).sum())
        refzero_ours_not = int(((b == 0) & (np.abs(a) > 1e-9)).sum())
        if viol or rel > 1e-4:
            print(f"{k:60s} {np.abs(b).max():10.3e} {d.max():10.3e} "
                  f"{rel:9.2e} {viol:7d} {refzero_ours_not:7d}")
        worst.append((rel, k))
    worst.sort(reverse=True)
    print("\nworst norm-relative leaves:")
    for rel, k in worst[:10]:
        print(f"  {rel:9.2e}  {k}")

    # knife-edge census on the worst leaf: are violating kernel elements the
    # ones whose torch grad is exactly zero or tiny?
    rel, k = worst[0]
    a, b = fg[k].astype(np.float64), fw[k].astype(np.float64)
    d = np.abs(a - b)
    mask = d > 5e-5
    print(f"\n[{k}] violations: {mask.sum()}, of which ref-grad exactly 0: "
          f"{int((b[mask] == 0).sum())}, |ref|<1e-5: "
          f"{int((np.abs(b[mask]) < 1e-5).sum())}")
    print(f"  norm(a)={np.linalg.norm(a):.4e} norm(b)={np.linalg.norm(b):.4e} "
          f"relnorm={rel:.2e}")


if __name__ == "__main__":
    main()
