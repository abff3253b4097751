"""Learnability proof (VERDICT r4 missing #3): the stack LEARNS, end to
end, through the real training CLI.

The reference's de-facto oracle is "training converges to published vIoU"
(SURVEY §4; /root/reference/engine.py:23-175 is the loop that realises
it). That oracle needs the real datasets + weeks of compute; this test is
its offline stand-in: overfit a tiny synthetic video-grounding set (8
videos, resnet14-scale model) with the EXACT production path — argparse
CLI -> DataLoader -> jitted train_step (loss + backward + clip + AdamW +
per-step LR) -> checkpoint -> evaluate() -> postprocess -> vIoU — and
assert that

* the total loss drops by a large factor,
* synthetic vIoU rises far above the *measured* untrained baseline
  (phase A evaluates the random-init model through the same CLI), and
* vIoU improves monotonically between the two eval points (ep 19 -> 39).

Reference trajectory (100-epoch pilot, constant lr 5e-4, seed 42,
single-thread CPU — docs/NOTES.md "Learnability"):

    epoch   loss    viou    tiou
    0       14.16   -       -
    19      8.47    0.065   0.680
    39      8.02    0.136   0.799
    79      5.86    0.245   0.773   (plateau)

Measured 40-epoch run (same flags, /tmp/lrn_train rehearsal): loss
14.16 -> 7.72, viou ep19 0.0647 -> ep39 0.1357, tiou 0.7994. Untrained
baseline through the eval-only CLI path: viou 0.0263 (that path writes
UNPREFIXED keys — no ``test_`` — because there is no train split).
Thresholds below keep >=1.4x margin on every measured number. Not in
the quick subset (~15 min on the 1-core box).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# tiny-but-real config: every architectural feature of the published
# model (two-stream fast/slow backbone, stride, text encoder, sted) at
# resnet14/32-dim scale so 80 optimizer steps overfit 8 videos
FLAGS = [
    "--combine_datasets", "synthetic",
    "--combine_datasets_val", "synthetic",
    "--schedule", "step",
    "--lr_drop", "1000",        # constant LR: decay starves the box head
    "--lr", "5e-4",
    "--lr_backbone", "2e-4",
    "--text_encoder_lr", "5e-4",
    "--freeze_text_encoder",
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
    "--no_guided_attn",
    "--no_aux_loss",
    "--dropout", "0.0",
    "--batch_size", "4",
    "--num_workers", "0",
]


def _env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["_TUBEDETR_TEST_REEXEC"] = "1"
    return env


def _run(args, timeout):
    r = subprocess.run(
        [sys.executable, "-m", "tubedetr_tpu.apps.train"] + FLAGS + args,
        cwd=REPO, env=_env(), timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    assert r.returncode == 0, r.stdout[-4000:]
    return r.stdout


@pytest.mark.timeout(2400)
def test_training_learns_synthetic_grounding(tmp_path):
    # phase A: untrained baseline through the same eval pipeline
    base_dir = tmp_path / "untrained"
    _run(["--eval", "--output-dir", str(base_dir)], timeout=600)
    base = json.loads((base_dir / "log_stats.json").read_text())
    base_viou = base["synthetic_declarative_viou"]
    assert 0.0 <= base_viou < 0.05, (
        f"random-init vIoU {base_viou} suspiciously high; synthetic task "
        "may have become trivial"
    )

    # phase B: 40 epochs (80 steps), evals at epochs 19 and 39
    out_dir = tmp_path / "trained"
    _run(
        ["--epochs", "40", "--eval_skip", "20",
         "--output-dir", str(out_dir)],
        timeout=1800,
    )
    rows = [json.loads(l) for l in
            (out_dir / "log.txt").read_text().splitlines()]
    evals = [r for r in rows if "test_synthetic_declarative_viou" in r]
    assert [r["epoch"] for r in evals] == [19, 39]

    first_loss = rows[0]["train_loss"]
    last_loss = min(r["train_loss"] for r in rows[-3:])
    assert last_loss < 0.65 * first_loss, (
        f"loss did not drop: {first_loss:.2f} -> {last_loss:.2f}"
    )

    v19 = evals[0]["test_synthetic_declarative_viou"]
    v39 = evals[1]["test_synthetic_declarative_viou"]
    assert v39 > v19, f"vIoU not improving: ep19 {v19:.4f} -> ep39 {v39:.4f}"
    assert v39 >= 0.09, f"trained vIoU too low: {v39:.4f}"
    assert v39 >= 3.0 * max(base_viou, 1e-3) and v39 >= base_viou + 0.05, (
        f"trained vIoU {v39:.4f} not well above untrained {base_viou:.4f}"
    )
    # temporal localisation should be strong by ep39 (pilot: 0.80)
    assert evals[1]["test_synthetic_declarative_tiou"] >= 0.6
