"""End-to-end smoke: synthetic dataset -> loader -> train epoch -> eval with
postprocess + vIoU evaluator -> checkpoint roundtrip. SURVEY.md §4's
"tiny synthetic dataset to run train/eval end-to-end" strategy."""

import numpy as np
import pytest

import jax

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.data.annotations import VideoAnnotation
from tubedetr_tpu.data.collate import collate
from tubedetr_tpu.data.synthetic import make_synthetic_batch_samples
from tubedetr_tpu.eval.viou import VIoUEvaluator
from tubedetr_tpu.models.tubedetr import build_model
from tubedetr_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from tubedetr_tpu.parallel.train_step import (
    create_train_state,
    make_eval_step,
    make_train_step,
    model_inputs,
)
from tubedetr_tpu.train.engine import evaluate


def tiny_cfg(**kw):
    base = dict(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=1,
        dim_feedforward=64,
        video_max_len=8,
        video_max_len_train=8,
        stride=2,
        max_text_len=8,
        text_vocab_size=128,
        text_hidden_size=32,
        text_layers=1,
        text_heads=4,
        text_ffn=64,
        text_max_positions=40,
        fast=True,
        guided_attn=False,
        sted=True,
        aux_loss=False,
        ema=False,
        dropout=0.0,
    )
    base.update(kw)
    return TubeDETRConfig(**base)


class SyntheticLoader:
    """Yields (device_batch, meta) pairs over fixed synthetic samples."""

    def __init__(self, samples, cfg, mesh):
        self.samples = samples
        self.cfg = cfg
        self.mesh = mesh

    def __len__(self):
        return 1

    def __iter__(self):
        batch, meta = collate(
            self.samples,
            self.cfg.video_max_len_train,
            self.cfg.stride,
            self.cfg.max_text_len,
        )
        yield shard_batch(batch, self.mesh), meta


def annotations_for(samples):
    anns = []
    for s in samples:
        h, w = s.orig_size
        boxes = {}
        s0, e0 = s.inter_idx
        for i in range(s0, e0 + 1):
            cx, cy, bw, bh = s.boxes_cxcywh[i]
            boxes[i] = [
                (cx - bw / 2) * w,
                (cy - bh / 2) * h,
                bw * w,
                bh * h,
            ]
        anns.append(
            VideoAnnotation(
                video_id=s.video_id,
                frame_ids=list(s.frames_id),
                inter_frames=list(range(s0, e0 + 1)),
                tube_start_frame=s0,
                tube_end_frame=e0 + 1,
                boxes_xywh=boxes,
                caption=s.caption,
                qtype=s.qtype,
                video_path="",
                start_seconds=0,
                duration_seconds=1,
            )
        )
    return anns


def test_e2e_train_then_eval_and_checkpoint(tmp_path):
    cfg = tiny_cfg()
    model = build_model(cfg)
    samples = make_synthetic_batch_samples(2, t=cfg.video_max_len_train)
    mesh = make_mesh(data=2, time=1, devices=jax.devices()[:2])

    batch, meta = collate(
        samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len
    )
    variables = model.init(jax.random.PRNGKey(0), **model_inputs(batch))
    state, tx, labels = create_train_state(cfg, variables)
    train_step = make_train_step(cfg, model, tx, labels, donate=False)

    lrs = {
        "lr": np.float32(2e-3),
        "lr_backbone": np.float32(1e-4),
        "lr_text_encoder": np.float32(1e-4),
    }
    with mesh:
        st = replicate(state, mesh)
        sharded = shard_batch(batch, mesh)
        first = last = None
        for i in range(6):
            st, metrics = train_step(st, sharded, lrs, np.int32(i))
            if first is None:
                first = float(metrics["loss_total"])
            last = float(metrics["loss_total"])
    assert np.isfinite(last) and last < first

    # ---- eval through the full engine/evaluator path -------------------
    evaluator = VIoUEvaluator(annotations_for(samples))
    eval_step = make_eval_step(cfg, model)
    with mesh:
        loader = SyntheticLoader(samples, cfg, mesh)
        evaluate(cfg, eval_step, st, loader, evaluator, "vidstg")
    out = evaluator.summarize()
    assert "declarative_viou" in out
    assert 0.0 <= out["declarative_viou"] <= 1.0
    assert out["declarative_gt_viou"] >= 0.0

    # ---- checkpoint roundtrip -----------------------------------------
    from tubedetr_tpu.train.checkpoint import load_checkpoint, save_checkpoint

    path = str(tmp_path / "ck.ckpt")
    save_checkpoint(
        path,
        st.params,
        st.buffers,
        opt_state=st.opt_state,
        epoch=3,
        config={"lr": cfg.lr},
    )
    ck = load_checkpoint(path)
    assert ck["epoch"] == 3
    k1 = np.asarray(
        jax.tree_util.tree_leaves(st.params)[0]
    )
    k2 = np.asarray(jax.tree_util.tree_leaves(ck["params"])[0])
    np.testing.assert_array_equal(k1, k2)

    # reload into a fresh state and verify eval outputs identical
    st2 = state.replace(params=ck["params"], buffers=ck["buffers"])
    with mesh:
        st2 = replicate(st2, mesh)
        o1, _ = eval_step(st, shard_batch(batch, mesh))
        o2, _ = eval_step(st2, shard_batch(batch, mesh))
    np.testing.assert_allclose(
        np.asarray(o1["pred_boxes"]), np.asarray(o2["pred_boxes"]), atol=1e-6
    )


def test_evaluate_test_mode_saves_attention_weights(tmp_path):
    """--test introspection path: evaluate() collects raw per-video
    predictions, splits cross-attn into text/spatial parts and stores
    TSA weights (/root/reference/engine.py:357-390)."""
    cfg = tiny_cfg(guided_attn=True)
    model = build_model(cfg)
    samples = make_synthetic_batch_samples(2, t=cfg.video_max_len_train)
    mesh = make_mesh(data=2, time=1, devices=jax.devices()[:2])
    batch, meta = collate(
        samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len
    )
    variables = model.init(jax.random.PRNGKey(0), **model_inputs(batch))
    state, tx, labels = create_train_state(cfg, variables)
    evaluator = VIoUEvaluator(annotations_for(samples), save_pred=True)
    eval_step = make_eval_step(cfg, model)
    cfg_test = cfg.replace(test=True)
    with mesh:
        st = replicate(state, mesh)
        loader = SyntheticLoader(samples, cfg, mesh)
        evaluate(cfg_test, eval_step, st, loader, evaluator, "vidstg",
                 test_mode=True)
    # attention weights captured per video
    assert set(evaluator.tsa_weights) == {s.video_id for s in samples}
    t = cfg.video_max_len_train
    vid0 = samples[0].video_id
    assert np.asarray(evaluator.tsa_weights[vid0]).shape == (t, t)
    # text part has max_text_len keys; spatial part has hw keys
    assert np.asarray(evaluator.text_weights[vid0]).shape[-1] == cfg.max_text_len
    out = evaluator.summarize()
    assert "tsa_weights" in out and "pred_sted" in out
