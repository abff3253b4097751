"""Attribution profiler for the TRAINING step (VERDICT r2 weak #4).

Inference is profiled to the millisecond per backbone stage
(scripts/profile_backbone.py), but the headline train step (117.6 ms at
8.50 steps/s, BENCH_MODE=train T=200 res=352 int8 fast+frozen passes) had
no equivalent breakdown. This script times jitted VARIANTS of the train
step on the real TPU — each chained K iterations inside one fori_loop so
the ~28 ms tunnel RTT amortises (docs/NOTES.md microbench rule) — and
derives a per-component attribution:

  fwd        forward + losses only (no backward)
  fwdbwd     + full backward (grads consumed via global norm)
  fwdbwd_xf  backward w.r.t. NON-backbone params only (backbone grads are
             constants -> XLA dead-code-eliminates the trainable-backbone
             VJP chain; backbone forward still runs)
  opt        optimizer alone: AdamW update + per-group LR scaling + apply
             on fixed grads (params/opt_state carried through the loop)
  full       the whole step: fwd + bwd + mask + clip-norm + AdamW (+EMA
             with PROF_EMA=1) — should reproduce bench.py train mode

  backbone bwd  = fwdbwd - fwdbwd_xf
  non-bb bwd    = fwdbwd_xf - fwd
  optimizer     = opt (cross-check: full - fwdbwd)

Env knobs mirror bench.py: PROF_T (200), PROF_RES (352), PROF_B (1),
PROF_STRIDE (4), PROF_K (8 chained), PROF_ITERS (3), PROF_QUANT_FAST /
PROF_QUANT_FROZEN (int8_static), PROF_REMAT (1), PROF_EMA (0),
PROF_VARIANTS (csv subset). Reference for what the step contains:
/root/reference/engine.py:33-108 (train_one_epoch body).
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(
    0, os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
)

T = int(os.environ.get("PROF_T", 200))
RES = int(os.environ.get("PROF_RES", 352))
B = int(os.environ.get("PROF_B", 1))
STRIDE = int(os.environ.get("PROF_STRIDE", 4))
K = int(os.environ.get("PROF_K", 8))
ITERS = int(os.environ.get("PROF_ITERS", 3))
QUANT_FAST = os.environ.get("PROF_QUANT_FAST", "int8_static")
QUANT_FROZEN = os.environ.get("PROF_QUANT_FROZEN", "int8_static")
REMAT = os.environ.get("PROF_REMAT", "1") == "1"
UNROLL_FAST = os.environ.get("PROF_UNROLL_FAST", "0") == "1"
EMA = os.environ.get("PROF_EMA", "0") == "1"
VARIANTS = os.environ.get(
    "PROF_VARIANTS", "fwd,fwdbwd,fwdbwd_xf,opt,full"
).split(",")


def main():
    import jax

    try:
        jax.config.update(
            "jax_compilation_cache_dir",
            os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".jax_cache",
            ),
        )
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:
        print(f"[prof] compilation cache unavailable: {e}", file=sys.stderr)

    import jax.numpy as jnp
    import ml_dtypes

    from tubedetr_tpu.config import TubeDETRConfig
    from tubedetr_tpu.losses.criterion import SetCriterion
    from tubedetr_tpu.models.tubedetr import build_model
    from tubedetr_tpu.train.optim import (
        build_optimizer,
        ema_update,
        mask_frozen_grads,
        scale_updates_by_lr,
    )

    cfg = TubeDETRConfig(
        backbone="resnet101",
        stride=STRIDE,
        resolution=RES,
        video_max_len=T,
        video_max_len_train=T,
        compute_dtype="bfloat16",
        fast=True,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        dropout=0.0,
        scan_backbone_blocks=True,
        remat_backbone=REMAT,
        share_backbone_inference=False,
        backbone_quant_fast=QUANT_FAST,
        backbone_quant_frozen=QUANT_FROZEN,
        unroll_quant_fast=UNROLL_FAST,
        share_backbone_train=os.environ.get("PROF_SHARE_TRAIN", "1") == "1",
    )
    model = build_model(cfg)
    criterion = SetCriterion(cfg.replace(guided_attn=True, aux_loss=True))

    rng = np.random.RandomState(0)
    tc = cfg.n_clips
    bf16 = ml_dtypes.bfloat16
    host_batch = dict(
        frames_slow=rng.randn(B, tc, RES, RES, 3).astype(bf16),
        slow_pad_mask=np.zeros((B, tc, RES, RES), dtype=bool),
        tokens=rng.randint(
            4, cfg.text_vocab_size, (B, cfg.max_text_len)
        ).astype(np.int32),
        text_pad_mask=np.broadcast_to(
            np.arange(cfg.max_text_len)[None] >= 12, (B, cfg.max_text_len)
        ).copy(),
        durations=np.full((B,), T, np.int32),
        frames_fast=rng.randn(B, T, RES, RES, 3).astype(bf16),
        fast_pad_mask=np.zeros((B, T, RES, RES), dtype=bool),
    )

    from tubedetr_tpu.apps.pipeline import fabricate_variables

    t0 = time.time()
    variables = fabricate_variables(model, host_batch, cast_f32_to=bf16)
    batch = {k: jax.device_put(v) for k, v in host_batch.items()}
    jax.block_until_ready(variables)
    jax.block_until_ready(batch)
    print(f"[prof] fabricate+upload {time.time()-t0:.1f}s", file=sys.stderr)

    if "int8_static" in (QUANT_FAST, QUANT_FROZEN):
        from tubedetr_tpu.models.quantize import get_or_calibrate_qscales

        t0 = time.time()
        qscales, source = get_or_calibrate_qscales(
            cfg,
            variables,
            batch,
            cache_dir=os.path.join(
                os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                ".qscales_cache",
            ),
            weights_tag=f"bench-fabricate-seed0-B{B}",
        )
        variables = {**variables, "qscales": jax.device_put(qscales)}
        jax.block_until_ready(variables)
        print(
            f"[prof] int8 scales {source} in {time.time()-t0:.1f}s",
            file=sys.stderr,
        )

    tx, labels = build_optimizer(cfg, variables["params"])
    opt_state = jax.jit(tx.init)(variables["params"])
    tb = np.clip(
        0.5 + 0.1 * np.random.RandomState(1).randn(B, T, 4), 0.05, 0.95
    ).astype(bf16)
    extra = {
        "target_boxes": jax.device_put(tb),
        "inter_idx": jax.device_put(
            np.tile(np.array([[2, T - 3]], np.int32), (B, 1))
        ),
        "time_mask": jax.device_put(np.ones((B, T), bool)),
    }
    lrs = {
        "lr": np.float32(1e-4),
        "lr_backbone": np.float32(1e-5),
        "lr_text_encoder": np.float32(1e-4),
    }
    buffers = variables.get("buffers", {})
    qvars = (
        {"qscales": variables["qscales"]} if "qscales" in variables else {}
    )

    def loss_of(params, b):
        out = model.apply(
            {"params": params, "buffers": buffers, **qvars},
            **b,
            deterministic=True,
        )
        losses = criterion(
            out,
            extra["target_boxes"].astype(jnp.float32),
            extra["inter_idx"],
            extra["time_mask"],
        )
        return criterion.total(losses)

    def perturb(b, i):
        bb = dict(b)
        bb["frames_fast"] = b["frames_fast"] + (
            i.astype(jnp.bfloat16) * jnp.bfloat16(1e-8)
        )
        return bb

    # ---- variants ------------------------------------------------------
    def v_fwd(params, opt_state_, b):
        def body(i, acc):
            return acc + loss_of(params, perturb(b, i))

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    def _grad_norm(grads):
        return jnp.sqrt(
            sum(
                jnp.sum(jnp.square(g))
                for g in jax.tree_util.tree_leaves(grads)
            )
        )

    def v_fwdbwd(params, opt_state_, b):
        def body(i, acc):
            loss, grads = jax.value_and_grad(
                lambda p: loss_of(p, perturb(b, i))
            )(params)
            grads = mask_frozen_grads(grads, labels)
            return acc + loss + _grad_norm(grads)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    def v_fwdbwd_xf(params, opt_state_, b):
        # grads w.r.t. every NON-backbone leaf only: the backbone params
        # enter as closed-over constants, so XLA eliminates the whole
        # backbone VJP chain (its forward still runs — both passes)
        bb = params["backbone"]
        rest = {k: v for k, v in params.items() if k != "backbone"}

        def body(i, acc):
            def loss_rest(r):
                return loss_of({**r, "backbone": bb}, perturb(b, i))

            loss, grads = jax.value_and_grad(loss_rest)(rest)
            return acc + loss + _grad_norm(grads)

        return jax.lax.fori_loop(0, K, body, jnp.float32(0.0))

    def v_opt(params, opt_state_, b):
        # optimizer cost alone: AdamW update + per-group LR scaling +
        # parameter apply (+EMA if enabled) on FIXED grads; params and
        # opt_state are carried so iterations are genuinely sequential
        grads = jax.tree_util.tree_map(
            lambda p: (p * jnp.asarray(1e-6, p.dtype)).astype(p.dtype),
            params,
        )
        grads = mask_frozen_grads(grads, labels)

        def body(_, carry):
            p, o, e = carry
            updates, o = tx.update(grads, o, p)
            updates = scale_updates_by_lr(updates, labels, lrs)
            p = jax.tree_util.tree_map(lambda x, u: x + u, p, updates)
            if e is not None:
                e = ema_update(e, p, cfg.ema_decay)
            return (p, o, e)

        ema0 = (
            jax.tree_util.tree_map(lambda x: x, params) if EMA else None
        )
        p, _, _ = jax.lax.fori_loop(
            0, K, body, (params, opt_state_, ema0)
        )
        # consume a small leaf so the loop isn't DCE'd (keep the readback tiny)
        return jnp.sum(
            jax.tree_util.tree_leaves(p)[0].astype(jnp.float32)
        )

    def v_full(params, opt_state_, b):
        def body(i, carry):
            p, o, e, _ = carry
            loss, grads = jax.value_and_grad(
                lambda q: loss_of(q, perturb(b, i))
            )(p)
            grads = mask_frozen_grads(grads, labels)
            updates, o = tx.update(grads, o, p)
            updates = scale_updates_by_lr(updates, labels, lrs)
            p = jax.tree_util.tree_map(lambda x, u: x + u, p, updates)
            if e is not None:
                e = ema_update(e, p, cfg.ema_decay)
            return (p, o, e, loss + _grad_norm(grads))

        ema0 = (
            jax.tree_util.tree_map(lambda x: x, params) if EMA else None
        )
        _, _, _, out = jax.lax.fori_loop(
            0, K, body, (params, opt_state_, ema0, jnp.float32(0.0))
        )
        return out

    fns = {
        "fwd": v_fwd,
        "fwdbwd": v_fwdbwd,
        "fwdbwd_xf": v_fwdbwd_xf,
        "opt": v_opt,
        "full": v_full,
    }

    results = {}
    for name in VARIANTS:
        fn = jax.jit(fns[name])
        t0 = time.time()
        first = float(fn(variables["params"], opt_state, batch))
        compile_s = time.time() - t0
        assert np.isfinite(first), (name, first)
        times = []
        for _ in range(ITERS):
            t0 = time.time()
            float(fn(variables["params"], opt_state, batch))
            times.append((time.time() - t0) / K)
        best = min(times)
        results[name] = best
        print(
            f"[prof] {name:10s} {best*1e3:8.1f} ms/step "
            f"(compile {compile_s:.0f}s, iters "
            f"{', '.join(f'{t*1e3:.1f}' for t in times)})",
            file=sys.stderr,
        )

    out = {
        "config": f"T={T} res={RES} B={B} k={STRIDE} "
        f"fast={QUANT_FAST} frozen={QUANT_FROZEN} remat={REMAT} "
        f"ema={EMA} unroll_fast={UNROLL_FAST}",
        "chained": K,
        "ms": {k: round(v * 1e3, 1) for k, v in results.items()},
    }
    if {"fwd", "fwdbwd", "fwdbwd_xf"} <= results.keys():
        out["attribution_ms"] = {
            "forward+losses": round(results["fwd"] * 1e3, 1),
            "backbone_bwd": round(
                (results["fwdbwd"] - results["fwdbwd_xf"]) * 1e3, 1
            ),
            "transformer+text+heads_bwd": round(
                (results["fwdbwd_xf"] - results["fwd"]) * 1e3, 1
            ),
        }
        if "full" in results and "fwdbwd" in results:
            out["attribution_ms"]["optimizer+apply"] = round(
                (results["full"] - results["fwdbwd"]) * 1e3, 1
            )
        if "opt" in results:
            out["attribution_ms"]["optimizer_isolated"] = round(
                results["opt"] * 1e3, 1
            )
    print(json.dumps(out))


if __name__ == "__main__":
    sys.exit(main())
