"""int8 PTQ in the eval CLI: `--eval --backbone_quant int8_static`
calibrates on the first val batch and produces vIoU metrics close to the
float eval; training with quant is still rejected loudly (PTQ has zero
gradients through round())."""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGS = [
    "--combine_datasets_val", "synthetic",
    "--eval",
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
]


def _env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "tubedetr_quant_cli_jaxcache"
    )
    return env


def _run(out_dir, extra_flags):
    return subprocess.run(
        [sys.executable, "-m", "tubedetr_tpu.apps.train", *FLAGS,
         "--output-dir", str(out_dir), *extra_flags],
        env=_env(), cwd=REPO, capture_output=True, text=True, timeout=1200,
    )


def _stats(out_dir):
    with open(os.path.join(str(out_dir), "log_stats.json")) as f:
        return json.load(f)


def test_quant_eval_close_to_float(tmp_path):
    r_f = _run(tmp_path / "float", [])
    assert r_f.returncode == 0, r_f.stdout[-3000:]
    r_q = _run(
        tmp_path / "int8",
        ["--backbone_quant", "int8_static",
         "--qscales_dir", str(tmp_path / "qscales")],
    )
    assert r_q.returncode == 0, r_q.stdout[-3000:]
    assert "[quant] int8_static scales calibrated" in r_q.stdout

    s_f, s_q = _stats(tmp_path / "float"), _stats(tmp_path / "int8")
    keys = [k for k in s_f if "viou" in k or "iou" in k]
    assert keys, sorted(s_f)
    for k in keys:
        if isinstance(s_f[k], (int, float)):
            # random tiny model: int8 noise shifts raw logits a little; the
            # metric must stay in the same regime as the float eval
            assert abs(s_f[k] - s_q[k]) < 0.15, (k, s_f[k], s_q[k])


def test_quant_train_still_rejected(tmp_path):
    flags = [f for f in FLAGS if f != "--eval"] + [
        "--combine_datasets", "synthetic", "--epochs", "1",
        "--backbone_quant", "int8_static",
    ]
    r = subprocess.run(
        [sys.executable, "-m", "tubedetr_tpu.apps.train", *flags,
         "--output-dir", str(tmp_path)],
        env=_env(), cwd=REPO, capture_output=True, text=True, timeout=600,
    )
    assert r.returncode != 0
    assert "zero gradients" in (r.stdout + r.stderr)
