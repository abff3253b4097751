"""Per-chip memory accounting for the sharded-training layouts.

Host-side only (jax.eval_shape on an abstract model init — no device, no
compile): computes what each state-sharding strategy leaves resident per
chip at the REAL model scale, so the ZeRO-1 / FSDP / TP trade-offs in
docs/SCALING.md carry numbers instead of adjectives.

  env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
      python scripts/report_sharding_memory.py [--data 8] [--model 1]

Counted state (training): params (f32) + AdamW moments m,v (2x params,
f32) + EMA (1x params) + backbone buffers. Activations are config- and
batch-dependent and are NOT counted here (see docs/NOTES.md rooflines).

Strategies:
  replicated          everything on every chip (reference DDP semantics)
  zero1               moments+EMA shard over data (--shard_optimizer_state)
  fsdp                params+EMA+moments shard over data (--shard_params;
                      conv backbone params stay replicated by design)
  tp                  Megatron model-axis placement (--mesh_model N)
  tp+fsdp             both (params shard model x data)
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np  # noqa: E402

import jax  # noqa: E402


def build_abstract_params(cfg):
    from tubedetr_tpu.models.tubedetr import build_model

    model = build_model(cfg)
    h = w = cfg.resolution
    t, tc = cfg.video_max_len_train, cfg.n_clips
    dummy = dict(
        frames_slow=jax.ShapeDtypeStruct((1, tc, h, w, 3), np.float32),
        slow_pad_mask=jax.ShapeDtypeStruct((1, tc, h, w), bool),
        tokens=jax.ShapeDtypeStruct((1, cfg.max_text_len), np.int32),
        text_pad_mask=jax.ShapeDtypeStruct((1, cfg.max_text_len), bool),
        durations=jax.ShapeDtypeStruct((1,), np.int32),
        frames_fast=jax.ShapeDtypeStruct((1, t, h, w, 3), np.float32),
        fast_pad_mask=jax.ShapeDtypeStruct((1, t, h, w), bool),
    )
    variables = jax.eval_shape(
        lambda d: model.init(jax.random.PRNGKey(0), **d), dummy
    )
    return variables


def shard_fraction(spec, shape, axes):
    """1/(product of engaged mesh-axis sizes) for one leaf."""
    frac = 1.0
    for entry in spec:
        if entry is None:
            continue
        names = entry if isinstance(entry, tuple) else (entry,)
        for n in names:
            frac /= axes[n]
    del shape
    return frac


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", type=int, default=8)
    ap.add_argument("--model", type=int, default=2)
    ap.add_argument("--backbone", default="resnet101")
    args = ap.parse_args()

    from tubedetr_tpu.config import TubeDETRConfig
    from tubedetr_tpu.parallel.mesh import _data_shard_pspec
    from tubedetr_tpu.parallel.tp import (
        _path_strings,
        _with_data_axis,
        tp_spec_for_path,
    )

    cfg = TubeDETRConfig(
        backbone=args.backbone, resolution=224, video_max_len=32,
        video_max_len_train=32, stride=4, fast=True, sted=True,
        guided_attn=True,
    )
    variables = build_abstract_params(cfg)
    params = variables["params"]
    buffers = variables.get("buffers", {})
    leaves = jax.tree_util.tree_leaves_with_path(params)
    n_params = sum(int(np.prod(x.shape)) for _, x in leaves)
    buf_bytes = sum(
        int(np.prod(x.shape)) * 4
        for x in jax.tree_util.tree_leaves(buffers)
    )
    print(
        f"model: {args.backbone} + roberta-base + {cfg.enc_layers}+"
        f"{cfg.dec_layers} d{cfg.hidden_dim}  "
        f"({n_params/1e6:.1f}M params, buffers {buf_bytes/2**20:.0f} MiB)"
    )
    print(f"mesh: data={args.data}, model={args.model}\n")

    def per_chip(strategy):
        axes_d = {"data": args.data, "time": 1, "model": 1}
        axes_m = {"data": args.data, "time": 1, "model": args.model}
        total = buf_bytes  # buffers replicate everywhere
        for path, x in leaves:
            shape, n = x.shape, int(np.prod(x.shape)) * 4
            pspec_tp = tp_spec_for_path(
                path, shape, args.model, cfg.nheads, cfg.text_heads
            )
            is_backbone = "backbone" in _path_strings(path)
            if strategy == "replicated":
                p_f, s_f = 1.0, 1.0
            elif strategy == "zero1":
                p_f = 1.0
                s_f = shard_fraction(
                    _data_shard_pspec(shape, args.data), shape, axes_d
                )
            elif strategy == "fsdp":
                spec = (
                    _with_data_axis(tp_spec_for_path(path, shape, 1, 1, 1),
                                    shape, args.data)
                    if not is_backbone
                    else tp_spec_for_path(path, shape, 1, 1, 1)
                )
                p_f = shard_fraction(spec, shape, axes_d)
                s_f = shard_fraction(
                    _with_data_axis(
                        tp_spec_for_path(path, shape, 1, 1, 1), shape,
                        args.data,
                    ),
                    shape, axes_d,
                )
            elif strategy == "tp":
                p_f = shard_fraction(pspec_tp, shape, axes_m)
                s_f = p_f
            elif strategy == "tp+fsdp":
                spec_p = (
                    _with_data_axis(pspec_tp, shape, args.data)
                    if not is_backbone else pspec_tp
                )
                p_f = shard_fraction(spec_p, shape, axes_m)
                s_f = shard_fraction(
                    _with_data_axis(pspec_tp, shape, args.data), shape,
                    axes_m,
                )
            # params f32 + moments 2x (s_f) + EMA 1x (s_f)
            total += n * p_f + n * 3 * s_f
        return total

    base = per_chip("replicated")
    print(f"{'strategy':<12} {'per-chip state':>16} {'vs replicated':>14}")
    for s in ("replicated", "zero1", "fsdp", "tp", "tp+fsdp"):
        b = per_chip(s)
        print(f"{s:<12} {b/2**30:>13.2f} GiB {base/b:>12.2f}x")


if __name__ == "__main__":
    main()
