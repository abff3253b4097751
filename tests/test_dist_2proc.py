"""Multi-process runtime integration: launch TWO real processes of the
train CLI in --eval mode on the synthetic dataset and assert the merged
metrics equal a single-process run (the reference's DDP eval path,
/root/reference/util/dist.py:210-247 + vidstg_eval.py:278-301).

Exercises: env-driven jax.distributed.initialize, per-process dataset
sharding, the file-based evaluator merge, cross-process meter reduction and
non-master print suppression."""

import json
import os
import socket
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


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


def _env(extra: dict) -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    # shared compilation cache shrinks the compile-time skew between the two
    # ranks (they race to the first collective; see dist.barrier)
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "tubedetr_dist_test_jaxcache"
    )
    env.update(extra)
    return env


def _run_eval(out_dir: str, extra_env: dict) -> subprocess.Popen:
    return subprocess.Popen(
        [sys.executable, "-m", "tubedetr_tpu.apps.train", *FLAGS,
         "--output-dir", out_dir],
        env=_env(extra_env),
        cwd=REPO,
        stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT,
        text=True,
    )


@pytest.mark.timeout(900)
def test_two_process_eval_matches_single_process(tmp_path):
    # --- single-process reference run ---------------------------------
    single_dir = str(tmp_path / "single")
    p = _run_eval(single_dir, {})
    out_single, _ = p.communicate(timeout=800)
    assert p.returncode == 0, out_single[-3000:]
    with open(os.path.join(single_dir, "log_stats.json")) as f:
        stats_single = json.load(f)
    assert stats_single, "single-process eval produced no stats"

    # --- two-process run ------------------------------------------------
    port = _free_port()
    multi_dir = str(tmp_path / "multi")
    procs = [
        _run_eval(
            multi_dir,
            {
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(i),
            },
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=800)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    with open(os.path.join(multi_dir, "log_stats.json")) as f:
        stats_multi = json.load(f)

    assert set(stats_multi) == set(stats_single)
    for k in stats_single:
        assert stats_multi[k] == pytest.approx(stats_single[k], abs=1e-5), k

    # non-master print suppression: both ranks print the force=True banner,
    # but only rank 0 prints the normal startup lines
    assert all("distributed: 2 processes" in o for o in outs)
    assert "number of params" in outs[0]
    assert "number of params" not in outs[1]


@pytest.mark.timeout(900)
def test_two_process_training_with_zero_sharding(tmp_path):
    """Live 2-process TRAINING: one epoch on the synthetic dataset with
    ZeRO-sharded optimizer state over a 2-way data axis. Exercises the
    gradient psum across processes (first-step barrier vs compile skew),
    the multi-process ZeRO placement (make_array_from_callback) and the
    collective gather before rank-0 checkpointing."""
    port = _free_port()
    out_dir = str(tmp_path / "train2")
    flags = [f for f in FLAGS if f != "--eval"] + [
        "--combine_datasets", "synthetic",
        "--epochs", "1",
        "--eval_skip", "2",  # train path only
        "--ema",
        "--shard_optimizer_state",
    ]
    procs = [
        subprocess.Popen(
            [sys.executable, "-m", "tubedetr_tpu.apps.train", *flags,
             "--output-dir", out_dir],
            env=_env({
                "JAX_COORDINATOR_ADDRESS": f"127.0.0.1:{port}",
                "JAX_NUM_PROCESSES": "2",
                "JAX_PROCESS_ID": str(i),
            }),
            cwd=REPO,
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for i in range(2)
    ]
    outs = [p.communicate(timeout=800)[0] for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-4000:]
    assert "[zero] optimizer state + EMA sharded" in outs[0]
    # rank 0 wrote the (gathered) checkpoint and the epoch log
    assert os.path.exists(os.path.join(out_dir, "checkpoint.ckpt")) or any(
        f.startswith("checkpoint") for f in os.listdir(out_dir)
    )
    with open(os.path.join(out_dir, "log.txt")) as f:
        line = json.loads(f.read().strip().splitlines()[-1])
    losses = [v for k, v in line.items()
              if k.startswith("train_") and "loss" in k]
    assert losses and all(
        isinstance(v, float) and v == v for v in losses  # finite, no NaN
    ), line
