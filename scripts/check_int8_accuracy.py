"""f32 vs int8_static output deviation at REAL model scale on the TPU.

Runs the flagship config (resnet101, k=4, res=352, T=200) twice with the
SAME fabricated weights and input — float path vs calibrated int8 path —
and reports the deviation of pred_boxes / pred_sted. Fabricated weights are
not trained weights, so treat the numbers as indicative of the quantization
noise floor, not of vIoU impact (that needs a released checkpoint; all
machinery exists via --load + --backbone_quant int8_static).

Usage: python scripts/check_int8_accuracy.py  [T=..., RES=... via env]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                 ".jax_cache"),
)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

import ml_dtypes

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.models.tubedetr import build_model

T = int(os.environ.get("T", 200))
RES = int(os.environ.get("RES", 352))


def main():
    base = TubeDETRConfig(
        backbone="resnet101",
        stride=4,
        resolution=RES,
        video_max_len=T,
        video_max_len_train=T,
        compute_dtype="bfloat16",
        fast=True,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        dropout=0.0,
        scan_backbone_blocks=False,
    )
    model_q = build_model(base.replace(backbone_quant="int8_static"))
    model_c = build_model(base.replace(backbone_quant="int8"))
    model_f = build_model(base)

    rng = np.random.RandomState(0)
    bf16 = ml_dtypes.bfloat16
    tc = base.n_clips
    batch = dict(
        frames_slow=rng.randn(1, tc, RES, RES, 3).astype(bf16),
        slow_pad_mask=np.zeros((1, tc, RES, RES), dtype=bool),
        tokens=rng.randint(4, base.text_vocab_size, (1, base.max_text_len)).astype(np.int32),
        text_pad_mask=np.broadcast_to(
            np.arange(base.max_text_len)[None] >= 12, (1, base.max_text_len)
        ).copy(),
        durations=np.full((1,), T, np.int32),
        frames_fast=rng.randn(1, T, RES, RES, 3).astype(bf16),
        fast_pad_mask=np.zeros((1, T, RES, RES), dtype=bool),
    )
    shapes = jax.eval_shape(model_q.init, jax.random.PRNGKey(0), **batch)
    rng_h = np.random.RandomState(0)

    def fab(path, leaf):
        name = str(getattr(path[-1], "key", path[-1]))
        if name in ("act_max", "out_max"):
            return np.zeros(leaf.shape, np.float32)
        if name == "running_var":
            return np.ones(leaf.shape, bf16)
        if name == "running_mean":
            return np.zeros(leaf.shape, bf16)
        if name == "scale" or (name == "weight" and len(leaf.shape) == 1):
            return np.ones(leaf.shape, bf16)
        if name == "bias":
            return np.zeros(leaf.shape, bf16)
        dt = bf16 if leaf.dtype == np.float32 else leaf.dtype
        return np.asarray(rng_h.randn(*leaf.shape) * 0.02, dt)

    variables = jax.device_put(jax.tree_util.tree_map_with_path(fab, shapes))
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    print("[acc] calibrating...", file=sys.stderr)
    _, upd = jax.jit(lambda v, b: model_c.apply(v, **b, mutable=["qscales"]))(
        variables, batch
    )
    v_q = {**variables, "qscales": jax.device_put(upd["qscales"])}
    v_f = {"params": variables["params"], "buffers": variables["buffers"]}

    print("[acc] float forward...", file=sys.stderr)
    out_f = jax.jit(lambda v, b: model_f.apply(v, **b))(v_f, batch)
    boxes_f = np.asarray(out_f["pred_boxes"], np.float64)
    sted_f = np.asarray(out_f["pred_sted"], np.float64)
    print("[acc] int8 forward...", file=sys.stderr)
    out_q = jax.jit(lambda v, b: model_q.apply(v, **b))(v_q, batch)
    boxes_q = np.asarray(out_q["pred_boxes"], np.float64)
    sted_q = np.asarray(out_q["pred_sted"], np.float64)

    db = np.abs(boxes_q - boxes_f)
    print(
        f"pred_boxes (cxcywh in [0,1]): max dev {db.max():.4f}, "
        f"mean dev {db.mean():.5f}, corr "
        f"{np.corrcoef(boxes_f.ravel(), boxes_q.ravel())[0, 1]:.5f}"
    )
    ds = np.abs(sted_q - sted_f)
    # sted matters through its per-video argmax
    am_f = sted_f[0].argmax(axis=0)
    am_q = sted_q[0].argmax(axis=0)
    print(
        f"pred_sted logits: max dev {ds.max():.4f}, mean {ds.mean():.5f}, "
        f"argmax(start,end) f32={am_f.tolist()} int8={am_q.tolist()}"
    )


if __name__ == "__main__":
    main()
