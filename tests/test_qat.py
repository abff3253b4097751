"""Quantization-aware training (--backbone_quant int8_qat).

The reference has no quantization at all; our int8 PTQ backbone is the
headline inference lever (1.64x), and QAT closes the loop: train the
backbone UNDER the int8 quantization noise (fake-quant forward + straight-
through-estimator backward) so the deployed int8_static model sees the
distribution it was trained for. Contracts pinned here:

* the qscales observer tree is IDENTICAL to the int8 carrier path's
  (conv1/downsample consume the prequantized stream and declare no
  observer), so one calibration serves PTQ eval, the int8 train passes,
  and QAT;
* the QAT forward numerically matches int8_static on the same params +
  scales (same grid; float vs int accumulation only);
* gradients flow through the fake-quant convs into the trainable backbone
  (STE), while the frozen stem/layer1 stay frozen via the grad mask;
* the train CLI accepts --backbone_quant int8_qat end-to-end (calibrate ->
  train -> eval -> checkpoint).
"""

import json
import os
import subprocess
import sys

import numpy as np

import jax
import jax.numpy as jnp

from tests.test_quant_fast_train import _batch, tiny_cfg
from tubedetr_tpu.models.quantize import calibrate_qscales
from tubedetr_tpu.models.tubedetr import build_model
from tubedetr_tpu.parallel.train_step import (
    create_train_state,
    make_train_step,
    model_inputs,
)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _setup():
    cfg_q = tiny_cfg(backbone_quant="int8_qat")
    model_q = build_model(cfg_q)
    batch = _batch(cfg_q)
    inputs = model_inputs(batch)
    variables = model_q.init(jax.random.PRNGKey(0), **inputs)
    qscales = calibrate_qscales(cfg_q, variables, inputs)
    return cfg_q, model_q, batch, inputs, variables, qscales


def test_qat_observer_tree_matches_int8_static():
    """The QAT model and the int8_static model declare the SAME qscales
    variables — calibration (dynamic int8) produces one tree for both."""
    cfg_q, model_q, batch, inputs, variables, qscales = _setup()
    cfg_s = tiny_cfg(backbone_quant="int8_static")
    vars_s = build_model(cfg_s).init(jax.random.PRNGKey(0), **inputs)

    def paths(tree):
        return {
            "/".join(
                str(getattr(k, "key", getattr(k, "name", getattr(k, "idx", k))))
                for k in p
            )
            for p, _ in jax.tree_util.tree_leaves_with_path(tree)
        }

    assert paths(variables["qscales"]) == paths(vars_s["qscales"])
    # carrier structure: block-input convs have no act_max observer
    q_paths = paths(variables["qscales"])
    assert not any("conv1/act_max" in p for p in q_paths), q_paths
    assert any("conv2/act_max" in p for p in q_paths)
    assert any("out_max" in p for p in q_paths)
    assert any("stem_act_max" in p for p in q_paths)


def test_qat_forward_matches_int8_static():
    """Same params + same calibrated scales: the fake-quant (QAT) forward
    sits on the same quantization grid as the true int8 forward — the only
    difference is float-conv vs int-conv accumulation."""
    cfg_q, model_q, batch, inputs, variables, qscales = _setup()
    cfg_s = tiny_cfg(backbone_quant="int8_static")
    model_s = build_model(cfg_s)
    vars_full = {"params": variables["params"],
                 "buffers": variables["buffers"], "qscales": qscales}
    out_q = model_q.apply(vars_full, **inputs)
    out_s = model_s.apply(vars_full, **inputs)
    bq = np.asarray(out_q["pred_boxes"], np.float32)
    bs = np.asarray(out_s["pred_boxes"], np.float32)
    assert np.isfinite(bq).all()
    assert np.abs(bq - bs).max() < 5e-3, np.abs(bq - bs).max()

    # and stays close to the float forward (quantization noise only)
    cfg_f = tiny_cfg()
    out_f = build_model(cfg_f).apply(
        {"params": variables["params"], "buffers": variables["buffers"]},
        **inputs,
    )
    bf = np.asarray(out_f["pred_boxes"], np.float32)
    assert np.abs(bq - bf).max() < 0.05, np.abs(bq - bf).max()


def test_qat_gradients_flow_through_fake_quant():
    """STE: gradients reach the trainable backbone stages THROUGH the
    fake-quantized convs of the slow pass (PTQ int8 would give zeros).
    resnet26 so the scanned stage tails (layerN_rest) exist too."""
    cfg_q = tiny_cfg(backbone_quant="int8_qat", backbone="resnet26")
    model_q = build_model(cfg_q)
    batch = _batch(cfg_q)
    inputs = model_inputs(batch)
    variables = model_q.init(jax.random.PRNGKey(0), **inputs)
    qscales = calibrate_qscales(cfg_q, variables, inputs)

    def loss(params):
        out = model_q.apply(
            {"params": params, "buffers": variables["buffers"],
             "qscales": qscales},
            **inputs,
        )
        return jnp.sum(jnp.square(out["pred_boxes"]))

    grads = jax.grad(loss)(variables["params"])
    assert all(
        np.isfinite(np.asarray(g)).all()
        for g in jax.tree_util.tree_leaves(grads)
    )
    for leaf in ("layer2_0", "layer3_0"):
        g = np.asarray(grads["backbone"][leaf]["conv1"]["kernel"])
        assert np.abs(g).max() > 0, leaf
    # scanned tail blocks too (stacked params)
    g_tail = np.asarray(
        grads["backbone"]["layer2_rest"]["block"]["conv2"]["kernel"]
    )
    assert np.abs(g_tail).max() > 0


def test_qat_train_step_updates_backbone():
    cfg_q, model_q, batch, inputs, variables, qscales = _setup()
    state, tx, labels = create_train_state(cfg_q, variables)
    step = make_train_step(
        cfg_q, model_q, tx, labels, donate=False,
        extra_vars={"qscales": qscales},
    )
    lrs = {
        "lr": np.float32(1e-3),
        "lr_backbone": np.float32(1e-4),
        "lr_text_encoder": np.float32(1e-3),
    }
    state0 = state
    for i in range(3):
        state, metrics = step(state, batch, lrs, np.int32(i))
        assert np.isfinite(float(metrics["loss_total"]))
    l2b = np.asarray(state0.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    l2a = np.asarray(state.params["backbone"]["layer2_0"]["conv1"]["kernel"])
    assert np.abs(l2a - l2b).max() > 0  # trains through the fake-quant
    sb = np.asarray(state0.params["backbone"]["conv1"]["kernel"])
    sa = np.asarray(state.params["backbone"]["conv1"]["kernel"])
    np.testing.assert_array_equal(sb, sa)  # frozen stem stays frozen


def test_dynamic_qscales_no_retrace():
    """--recalibrate_each_epoch plumbing: with dynamic_extra_vars the
    compiled step takes the scales as a runtime argument — refreshed
    values (same shapes) must reuse the executable, not retrace."""
    cfg_q, model_q, batch, inputs, variables, qscales = _setup()
    state, tx, labels = create_train_state(cfg_q, variables)
    step = make_train_step(
        cfg_q, model_q, tx, labels, donate=False, dynamic_extra_vars=True
    )
    lrs = {
        "lr": np.float32(1e-3),
        "lr_backbone": np.float32(1e-4),
        "lr_text_encoder": np.float32(1e-3),
    }
    state, m1 = step(state, batch, lrs, np.int32(0), {"qscales": qscales})
    refreshed = jax.tree_util.tree_map(lambda x: x * 1.5, qscales)
    state, m2 = step(state, batch, lrs, np.int32(1), {"qscales": refreshed})
    assert np.isfinite(float(m1["loss_total"]))
    assert np.isfinite(float(m2["loss_total"]))
    assert step._cache_size() == 1  # same executable served both


def test_train_cli_qat(tmp_path):
    """--backbone_quant int8_qat end-to-end: calibrates once (reused for
    train + eval), trains an epoch with finite losses, evals, checkpoints."""
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "tubedetr_qat_cli_jaxcache"
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
        "--eval_skip", "1",  # eval runs the fake-quant forward too
        "--backbone_quant", "int8_qat",
        # refresh the static scales at the epoch boundary (one observer
        # forward; the dynamic-scales step reuses its executable)
        "--recalibrate_each_epoch",
        "--qscales_dir", str(tmp_path / "qscales"),
    ]
    r = subprocess.run(
        [sys.executable, "-m", "tubedetr_tpu.apps.train", *flags,
         "--output-dir", str(tmp_path)],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    assert r.returncode == 0, (r.stdout[-3000:], r.stderr[-2000:])
    assert "[quant] int8_qat scales" in r.stdout
    assert "[quant] training scales reuse the eval calibration" in r.stdout
    assert "scales recalibrated" in r.stdout
    assert "activation drift: worst observed/baked" in r.stdout
    line = json.loads(
        (tmp_path / "log.txt").read_text().strip().splitlines()[-1]
    )
    train_losses = [v for k, v in line.items()
                    if k.startswith("train_") and "loss" in k]
    assert train_losses and all(np.isfinite(v) for v in train_losses), line
    assert any(k.endswith("_viou") for k in line), line

    # --- deployment loop: the QAT checkpoint serves on the TRUE int8 path
    ck = tmp_path / "checkpoint.ckpt"
    assert ck.exists()

    # the checkpoint must embed the per-epoch RECALIBRATED scales, not the
    # startup calibration (r3 review: eval/deploy served stale scales) —
    # recalibration ran on a train batch with trained weights, so at least
    # one observed activation maximum differs from the startup sidecar
    import jax

    from tubedetr_tpu.models.quantize import load_qscales
    from tubedetr_tpu.train.checkpoint import load_checkpoint

    ck_q = load_checkpoint(str(ck)).get("qscales")
    assert ck_q is not None
    sidecars = sorted((tmp_path / "qscales").glob("*.npz"))
    assert sidecars, "startup calibration never persisted"
    startup = load_qscales(str(sidecars[0]))
    ck_leaves = jax.tree_util.tree_leaves(ck_q)
    st_leaves = jax.tree_util.tree_leaves(startup)
    assert len(ck_leaves) == len(st_leaves)
    assert any(
        float(np.max(np.abs(np.asarray(a) - np.asarray(b)))) > 0
        for a, b in zip(ck_leaves, st_leaves)
    ), "checkpoint qscales are bitwise the startup calibration"
    r2 = subprocess.run(
        [sys.executable, "-m", "tubedetr_tpu.apps.train",
         *[f for f in flags if f not in
           ("--backbone_quant", "int8_qat", "--recalibrate_each_epoch")],
         "--backbone_quant", "int8_static",
         "--eval", "--load", str(ck),
         "--output-dir", str(tmp_path / "deploy")],
        env=env, cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    assert r2.returncode == 0, (r2.stdout[-3000:], r2.stderr[-2000:])
    assert "[quant] int8_static scales" in r2.stdout
    assert "_viou" in r2.stdout or "viou" in r2.stdout, r2.stdout[-2000:]
