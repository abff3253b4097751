"""Quantization accuracy on a TASK (VERDICT r4 next #4), reduced.

The full study (scripts/synthetic_study.py --study quant, results in
docs/NOTES.md round-5 + docs/bench_r05/study_quant.json) trains float
100 epochs then QAT 20; this test pins its reduced 40+10-epoch prefix
through the real CLI so the claim "int8 PTQ costs ~nothing on the task
and the QAT path trains" stays executable:

* train float 40 epochs (the learnability recipe, measured vIoU 0.136),
* eval the checkpoint float and with the REAL int8_static kernels (PTQ
  calibrates activation scales from a forward at load time),
* QAT-finetune 10 epochs (fake-quant STE) and eval int8_static again.

Full-study anchors (100ep float): float 0.2438 / PTQ 0.2603 / QAT->int8
0.3167 — PTQ inside noise of float, QAT trainable. Thresholds below are
generous (>=60% of the float number) because 8 val videos are noisy.
Not in the quick subset (~12 min on the 1-core box).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

from test_learnability import FLAGS, _env  # same tiny-but-real recipe


def _run(args, timeout):
    r = subprocess.run(
        [sys.executable, "-m", "tubedetr_tpu.apps.train"] + FLAGS + args,
        cwd=REPO, env=_env(), timeout=timeout,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    assert r.returncode == 0, r.stdout[-4000:]
    return r.stdout


def _viou(out_dir):
    stats = json.loads((out_dir / "log_stats.json").read_text())
    return stats["synthetic_declarative_viou"]


@pytest.mark.timeout(2400)
def test_int8_ptq_and_qat_hold_task_accuracy(tmp_path):
    float_dir = tmp_path / "float"
    _run(["--epochs", "40", "--eval_skip", "100",
          "--output-dir", str(float_dir)], timeout=1200)
    ckpt = str(float_dir / "checkpoint.ckpt")

    fe = tmp_path / "float_eval"
    _run(["--eval", "--load", ckpt, "--output-dir", str(fe)], timeout=600)
    float_viou = _viou(fe)
    assert float_viou >= 0.09, f"float training underperformed: {float_viou}"

    pe = tmp_path / "ptq_eval"
    _run(["--eval", "--load", ckpt, "--backbone_quant", "int8_static",
          "--output-dir", str(pe)], timeout=600)
    ptq_viou = _viou(pe)
    assert ptq_viou >= 0.6 * float_viou, (
        f"PTQ int8_static dropped too much: {float_viou:.4f} -> "
        f"{ptq_viou:.4f}"
    )

    qd = tmp_path / "qat"
    _run(["--epochs", "10", "--eval_skip", "100", "--load", ckpt,
          "--backbone_quant", "int8_qat", "--output-dir", str(qd)],
         timeout=900)
    qe = tmp_path / "qat_eval"
    _run(["--eval", "--load", str(qd / "checkpoint.ckpt"),
          "--backbone_quant", "int8_static", "--output-dir", str(qe)],
         timeout=600)
    qat_viou = _viou(qe)
    assert qat_viou >= 0.6 * float_viou, (
        f"QAT->int8_static regressed the task: float {float_viou:.4f}, "
        f"qat-int8 {qat_viou:.4f}"
    )
    print(f"[quant-accuracy] float {float_viou:.4f} ptq {ptq_viou:.4f} "
          f"qat-int8 {qat_viou:.4f}")
