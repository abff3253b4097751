#!/usr/bin/env python3
"""Synthetic-task accuracy studies (VERDICT r4 next #4 and #7), offline.

Runs the real training CLI on the procedural synthetic grounding task
(the learnability recipe, tests/test_learnability.py / docs/NOTES.md) to
answer two questions the unit tests cannot:

* **quant**: what does int8 PTQ cost in task accuracy, and does QAT
  recover it? float train -> eval float + eval int8_static (PTQ) ->
  int8_qat finetune -> eval int8_static again (QAT).
* **nq**: does nq=4 + ``--nq_select sted`` hold up end-to-end against
  the default nq=1 after real training?

Usage (CPU, ~30-60 min total):
    env -u PALLAS_AXON_POOL_IPS JAX_PLATFORMS=cpu \
        python scripts/synthetic_study.py --study quant --out /tmp/study
    ... --study nq

Prints one JSON summary line per study; details land in --out.
"""

import argparse
import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

BASE_FLAGS = [
    "--combine_datasets", "synthetic",
    "--combine_datasets_val", "synthetic",
    "--schedule", "step",
    "--lr_drop", "1000",
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


def run_cli(args, tag, env_extra=None):
    env = dict(os.environ)
    if env_extra:
        env.update(env_extra)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=1")
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["_TUBEDETR_TEST_REEXEC"] = "1"
    print(f"[study] {tag}: train.py {' '.join(args)}", file=sys.stderr)
    r = subprocess.run(
        [sys.executable, "-m", "tubedetr_tpu.apps.train"] + BASE_FLAGS + args,
        cwd=REPO, env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True, timeout=3600,
    )
    if r.returncode != 0:
        print(r.stdout[-6000:], file=sys.stderr)
        raise SystemExit(f"{tag} failed rc={r.returncode}")
    return r.stdout


def read_eval(out_dir, source="log_stats.json"):
    p = os.path.join(out_dir, source)
    if source == "log_stats.json" and os.path.exists(p):
        d = json.load(open(p))
    else:  # last eval row of log.txt
        rows = [json.loads(l) for l in open(os.path.join(out_dir, "log.txt"))]
        d = [r for r in rows if any("viou" in k for k in r)][-1]
    return {
        k.replace("test_synthetic_", "").replace("synthetic_", ""): round(v, 4)
        for k, v in d.items()
        if isinstance(v, float) and ("iou" in k)
    }


def study_quant(out):
    float_dir = os.path.join(out, "float")
    if not os.path.exists(os.path.join(float_dir, "checkpoint.ckpt")):
        run_cli(["--epochs", "100", "--eval_skip", "100",
                 "--output-dir", float_dir], "float-train")
    ckpt = os.path.join(float_dir, "checkpoint.ckpt")

    fe = os.path.join(out, "float_eval")
    run_cli(["--eval", "--load", ckpt, "--output-dir", fe], "float-eval")
    pe = os.path.join(out, "ptq_eval")
    run_cli(["--eval", "--load", ckpt, "--backbone_quant", "int8_static",
             "--output-dir", pe], "ptq-eval")

    qd = os.path.join(out, "qat")
    # QAT finetune: fake-quant (STE) the trainable slow pass for 20 more
    # epochs from the float checkpoint, then measure with the REAL
    # int8_static kernels
    run_cli(["--epochs", "20", "--eval_skip", "100", "--load", ckpt,
             "--backbone_quant", "int8_qat", "--output-dir", qd],
            "qat-finetune")
    qe = os.path.join(out, "qat_eval")
    run_cli(["--eval", "--load", os.path.join(qd, "checkpoint.ckpt"),
             "--backbone_quant", "int8_static", "--output-dir", qe],
            "qat-int8-eval")

    summary = {
        "float": read_eval(fe),
        "ptq_int8_static": read_eval(pe),
        "qat_then_int8_static": read_eval(qe),
    }
    print(json.dumps({"study": "quant", **summary}))


def study_nq(out):
    res = {}
    for tag, extra in (
        ("nq1", []),
        ("nq4_sted", ["--num_queries", "4", "--nq_select", "sted"]),
        ("nq4_video", ["--num_queries", "4", "--nq_select", "sted",
                       "--nq_match", "video"]),
    ):
        d = os.path.join(out, tag)
        if not os.path.exists(os.path.join(d, "log.txt")):
            run_cli(["--epochs", "100", "--eval_skip", "50",
                     "--output-dir", d] + extra, f"{tag}-train")
        res[tag] = read_eval(d, source="log.txt")

    # eval-only A/B on the trained nq=4 checkpoint: sted selection vs the
    # canonical query 0, through the REAL CLI eval path, plus selection
    # accuracy vs the training criterion's per-frame Hungarian match
    # (TUBEDETR_QSEL_LOG hook in train/engine.py:_maybe_log_qsel)
    ckpt = os.path.join(out, "nq4_sted", "checkpoint.ckpt")
    qsel_log = os.path.join(out, "qsel_nq4.jsonl")
    if os.path.exists(qsel_log):
        os.remove(qsel_log)
    for sel in ("sted", "first"):
        d = os.path.join(out, f"nq4_eval_{sel}")
        env_extra = {"TUBEDETR_QSEL_LOG": qsel_log} if sel == "sted" else None
        run_cli(["--eval", "--load", ckpt, "--num_queries", "4",
                 "--nq_select", sel, "--output-dir", d],
                f"nq4-eval-{sel}", env_extra=env_extra)
        res[f"nq4_eval_{sel}"] = read_eval(d)
    rows = [json.loads(l) for l in open(qsel_log)]
    agr = [r["agreement"] for r in rows]
    res["selection"] = {
        "clips": len(rows),
        "mean_frame_agreement": round(sum(agr) / max(len(agr), 1), 4),
        "clips_majority_agree": sum(a > 0.5 for a in agr),
    }

    # video-matched variant: selection accuracy is against the per-video
    # assignment (matched_video in the qsel rows), which is the quantity
    # --nq_match video trains
    vq_log = os.path.join(out, "qsel_nq4_video.jsonl")
    if os.path.exists(vq_log):
        os.remove(vq_log)
    vckpt = os.path.join(out, "nq4_video", "checkpoint.ckpt")
    d = os.path.join(out, "nq4_video_eval")
    run_cli(["--eval", "--load", vckpt, "--num_queries", "4",
             "--nq_select", "sted", "--nq_match", "video",
             "--output-dir", d],
            "nq4-video-eval", env_extra={"TUBEDETR_QSEL_LOG": vq_log})
    res["nq4_video_eval"] = read_eval(d)
    vrows = [json.loads(l) for l in open(vq_log)]
    res["video_selection"] = {
        "clips": len(vrows),
        "selection_accuracy": round(
            sum(r["video_agreement"] for r in vrows) / max(len(vrows), 1), 4
        ),
    }
    print(json.dumps({"study": "nq", **res}))


def study_obj(out):
    """nq=4 + the learned objectness head (round 5): does per-frame
    query selection from the trained objectness logits recover what
    per-video sted selection measurably cannot (docs/NOTES.md round 5:
    frame-level matching trains different queries on different frames,
    so no per-video winner exists)? Train nq=4 with the objectness loss,
    then eval the SAME checkpoint with --nq_select objectness vs first,
    with per-frame selection accuracy instrumentation."""
    res = {}
    d = os.path.join(out, "nq4_obj")
    if not os.path.exists(os.path.join(d, "log.txt")):
        run_cli(["--epochs", "100", "--eval_skip", "50",
                 "--num_queries", "4", "--nq_select", "objectness",
                 "--output-dir", d], "nq4-obj-train")
    res["nq4_obj_train"] = read_eval(d, source="log.txt")

    ckpt = os.path.join(d, "checkpoint.ckpt")
    qsel_log = os.path.join(out, "qsel_nq4_obj.jsonl")
    if os.path.exists(qsel_log):
        os.remove(qsel_log)
    for sel in ("objectness", "first"):
        e = os.path.join(out, f"nq4_obj_eval_{sel}")
        env_extra = (
            {"TUBEDETR_QSEL_LOG": qsel_log} if sel == "objectness" else None
        )
        run_cli(["--eval", "--load", ckpt, "--num_queries", "4",
                 "--nq_select", sel, "--output-dir", e],
                f"nq4-obj-eval-{sel}", env_extra=env_extra)
        res[f"nq4_obj_eval_{sel}"] = read_eval(e)
    rows = [json.loads(l) for l in open(qsel_log)]
    agr = [r["agreement"] for r in rows]
    res["selection"] = {
        "clips": len(rows),
        "mean_frame_agreement": round(sum(agr) / max(len(agr), 1), 4),
        "clips_majority_agree": sum(a > 0.5 for a in agr),
    }
    print(json.dumps({"study": "obj", **res}))


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--study", choices=["quant", "nq", "obj"], required=True)
    ap.add_argument("--out", required=True)
    a = ap.parse_args()
    os.makedirs(a.out, exist_ok=True)
    {"quant": study_quant, "nq": study_nq, "obj": study_obj}[a.study](a.out)
