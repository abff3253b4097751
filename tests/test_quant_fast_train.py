"""backbone_quant_fast: int8 for the TRAINING fast-stream backbone pass.

The fast branch never backpropagates into the backbone
(/root/reference/models/tubedetr.py:127-131 runs it under no_grad), so the
T-frame fast pass can run on the int8 MXU path while the slow pass keeps
bf16/f32 gradients. The int8 trunk shares every parameter with the float
backbone via nn.share_scope — these tests pin that contract:

* the variable tree grows ONLY a qscales collection (no duplicate backbone);
* the quantized-fast forward stays close to the float two-pass forward;
* gradients still reach the backbone (through the slow pass);
* the train CLI accepts --backbone_quant_fast, calibrates on a train batch,
  and completes an epoch with finite losses.
"""

import json
import os
import subprocess
import sys

import numpy as np

import jax
import jax.numpy as jnp

from tubedetr_tpu.config import TubeDETRConfig
from tubedetr_tpu.data.collate import collate
from tubedetr_tpu.data.synthetic import make_synthetic_batch_samples
from tubedetr_tpu.models.tubedetr import build_model
from tubedetr_tpu.parallel.train_step import (
    create_train_state,
    make_train_step,
    model_inputs,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def tiny_cfg(**kw):
    base = dict(
        backbone="resnet14",
        hidden_dim=32,
        nheads=4,
        enc_layers=1,
        dec_layers=2,
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
        guided_attn=True,
        sted=True,
        aux_loss=True,
        dropout=0.0,
        # force the two-pass (training-semantics) forward even under
        # deterministic=True so the fast trunk actually executes
        share_backbone_inference=False,
    )
    base.update(kw)
    return TubeDETRConfig(**base)


def _batch(cfg, b=2):
    samples = make_synthetic_batch_samples(b, t=cfg.video_max_len_train)
    batch, _ = collate(
        samples, cfg.video_max_len_train, cfg.stride, cfg.max_text_len
    )
    return batch


def test_shared_params_forward_and_grads():
    cfg_f = tiny_cfg()
    cfg_q = tiny_cfg(backbone_quant_fast="int8")
    model_f = build_model(cfg_f)
    model_q = build_model(cfg_q)
    batch = _batch(cfg_f)
    inputs = model_inputs(batch)

    vars_f = model_f.init(jax.random.PRNGKey(0), **inputs)
    vars_q = model_q.init(jax.random.PRNGKey(0), **inputs)

    # --- parameter tree is IDENTICAL (scope shared, no backbone_fast copy)
    paths_f = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(vars_f["params"])
    }
    paths_q = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(vars_q["params"])
    }
    assert paths_f == paths_q
    assert "qscales" in vars_q and "qscales" not in vars_f
    # every observer lives under the shared backbone scope
    q_paths = [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(vars_q["qscales"])
    ]
    assert q_paths and all("backbone" in p for p in q_paths)

    # --- quantized-fast forward close to the float forward on the same
    # weights (dynamic int8: per-tensor scales, random tiny weights)
    out_f = model_f.apply(vars_f, **inputs)
    out_q = model_q.apply(
        {**{k: vars_f[k] for k in ("params", "buffers")},
         "qscales": vars_q["qscales"]},
        **inputs,
    )
    bf = np.asarray(out_f["pred_boxes"], np.float32)
    bq = np.asarray(out_q["pred_boxes"], np.float32)
    assert np.isfinite(bq).all()
    assert np.abs(bf - bq).max() < 0.05, np.abs(bf - bq).max()

    # --- gradients reach the backbone through the slow pass -------------
    def loss(params):
        out = model_q.apply(
            {"params": params, "buffers": vars_f["buffers"],
             "qscales": vars_q["qscales"]},
            **inputs,
        )
        return jnp.sum(jnp.square(out["pred_boxes"]))

    grads = jax.grad(loss)(vars_f["params"])
    leaves = jax.tree_util.tree_leaves(grads)
    assert all(np.isfinite(np.asarray(g)).all() for g in leaves)
    g_l2 = np.asarray(grads["backbone"]["layer2_0"]["conv1"]["kernel"])
    assert np.abs(g_l2).max() > 0  # slow pass still backpropagates


def test_unroll_quant_fast_bit_identical():
    """--unroll_quant_fast inlines the scanned stage tails for the
    gradient-free fast pass only (nn.scan(unroll=n)); the stacked scan
    parameter layout is unchanged and the outputs are BIT-identical —
    it is purely an XLA scheduling/fusion lever (docs/NOTES.md: scan
    boundaries block the int8 quantize's producer-epilogue fusion)."""
    cfg_s = tiny_cfg(backbone_quant_fast="int8_static")
    cfg_u = tiny_cfg(backbone_quant_fast="int8_static",
                     unroll_quant_fast=True)
    model_s, model_u = build_model(cfg_s), build_model(cfg_u)
    batch = _batch(cfg_s)
    inputs = model_inputs(batch)
    v = model_s.init(jax.random.PRNGKey(0), **inputs)

    from tubedetr_tpu.models.quantize import calibrate_qscales

    q = calibrate_qscales(cfg_s, v, inputs)
    vars_full = {"params": v["params"], "buffers": v["buffers"],
                 "qscales": q}
    # same stacked param tree serves both (unroll is call-level)
    out_s = model_s.apply(vars_full, **inputs)
    out_u = model_u.apply(vars_full, **inputs)
    for k in ("pred_boxes", "pred_sted"):
        np.testing.assert_array_equal(
            np.asarray(out_s[k]), np.asarray(out_u[k])
        )


def test_train_step_with_quant_fast():
    cfg = tiny_cfg(backbone_quant_fast="int8", ema=True)
    model = build_model(cfg)
    batch = _batch(cfg)
    variables = model.init(jax.random.PRNGKey(0), **model_inputs(batch))
    state, tx, labels = create_train_state(cfg, variables)
    step = make_train_step(
        cfg, model, tx, labels, donate=False,
        extra_vars={"qscales": variables["qscales"]},
    )
    lrs = {
        "lr": np.float32(1e-3),
        "lr_backbone": np.float32(1e-4),
        "lr_text_encoder": np.float32(1e-3),
    }
    state0 = state
    losses = []
    for i in range(4):
        state, metrics = step(state, batch, lrs, np.int32(i))
        losses.append(float(metrics["loss_total"]))
    # int8 noise on a tiny random model makes strict loss descent flaky;
    # the quant-fast contract is: steps run, stay finite, and update the
    # right parameters (descent itself is pinned by the float-path test)
    assert all(np.isfinite(losses)), losses
    assert int(state.step) == 4
    l2b = np.asarray(state0.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    l2a = np.asarray(state.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    assert np.abs(l2a - l2b).max() > 0  # backbone still trains (slow pass)
    sb = np.asarray(state0.params["backbone"]["conv1"]["kernel"])
    sa = np.asarray(state.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(sb, sa)  # stem stays frozen


def test_train_cli_quant_fast(tmp_path):
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "tubedetr_quant_fast_cli_jaxcache"
    )
    flags = [
        "--combine_datasets", "synthetic",
        "--combine_datasets_val", "synthetic",
        "--backbone", "resnet14",
        "--hidden_dim", "32",
        "--nheads", "4",
        "--enc_layers", "1",
        "--dec_layers", "1",
        "--dim_feedforward", "64",
        "--video_max_len", "8",
        "--video_max_len_train", "8",
        "--stride", "2",
        "--max_text_len", "8",
        "--text_vocab_size", "128",
        "--text_hidden_size", "32",
        "--text_layers", "1",
        "--text_heads", "4",
        "--text_ffn", "64",
        "--batch_size", "2",
        "--num_workers", "0",
        "--epochs", "1",
        "--eval_skip", "2",  # skip eval: this test targets the train path
        "--backbone_quant_fast", "int8_static",
        # hermetic: keep the qscales sidecar out of the repo's cache dir
        "--qscales_dir", str(tmp_path / "qscales"),
    ]
    r = subprocess.run(
        [sys.executable, "-m", "tubedetr_tpu.apps.train", *flags,
         "--output-dir", str(tmp_path)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-2000:])
    assert "[quant] backbone_quant_fast/frozen scales calibrated" in r.stdout
    log = tmp_path / "log.txt"
    assert log.exists()
    line = json.loads(log.read_text().strip().splitlines()[-1])
    train_losses = [v for k, v in line.items()
                    if k.startswith("train_") and "loss" in k]
    assert train_losses and all(np.isfinite(v) for v in train_losses), line


def test_frozen_prefix_quant_trains_correctly():
    """backbone_quant_frozen: only the always-frozen prefix (stem+layer1)
    of the slow pass runs int8; layers 2-4 stay float and still train.
    Parameter tree unchanged; forward stays close to the float model."""
    cfg_f = tiny_cfg()
    cfg_q = tiny_cfg(backbone_quant_frozen="int8")
    model_f = build_model(cfg_f)
    model_q = build_model(cfg_q)
    batch = _batch(cfg_f)
    inputs = model_inputs(batch)

    vars_f = model_f.init(jax.random.PRNGKey(0), **inputs)
    vars_q = model_q.init(jax.random.PRNGKey(0), **inputs)
    paths_f = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(vars_f["params"])
    }
    paths_q = {
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(vars_q["params"])
    }
    assert paths_f == paths_q
    # observers exist ONLY for the prefix (stem + layer1); layer2+ has none
    q_paths = [
        jax.tree_util.keystr(p)
        for p, _ in jax.tree_util.tree_leaves_with_path(vars_q["qscales"])
    ]
    assert any("stem_act_max" in p for p in q_paths)
    assert any("layer1" in p for p in q_paths)
    assert not any("layer2" in p or "layer3" in p for p in q_paths), q_paths

    out_f = model_f.apply(vars_f, **inputs)
    out_q = model_q.apply(
        {**{k: vars_f[k] for k in ("params", "buffers")},
         "qscales": vars_q["qscales"]},
        **inputs,
    )
    bf = np.asarray(out_f["pred_boxes"], np.float32)
    bq = np.asarray(out_q["pred_boxes"], np.float32)
    assert np.isfinite(bq).all()
    assert np.abs(bf - bq).max() < 0.05, np.abs(bf - bq).max()

    # a full train step: layer2 trains, stem stays frozen, losses finite
    state, tx, labels = create_train_state(cfg_q, vars_q)
    step = make_train_step(
        cfg_q, model_q, tx, labels, donate=False,
        extra_vars={"qscales": vars_q["qscales"]},
    )
    lrs = {
        "lr": np.float32(1e-3),
        "lr_backbone": np.float32(1e-4),
        "lr_text_encoder": np.float32(1e-3),
    }
    state0 = state
    for i in range(2):
        state, metrics = step(state, batch, lrs, np.int32(i))
        assert np.isfinite(float(metrics["loss_total"]))
    l2b = np.asarray(state0.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    l2a = np.asarray(state.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    assert np.abs(l2a - l2b).max() > 0
    sb = np.asarray(state0.params["backbone"]["conv1"]["kernel"])
    sa = np.asarray(state.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(sb, sa)
