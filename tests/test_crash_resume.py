"""Preemption fault injection (SURVEY §5.3: the reference has NO fault
injection; its recovery contract is checkpoint-based ``--resume``,
/root/reference/main.py:549-568). SIGKILL the real training CLI mid-run,
then ``--resume`` from the surviving checkpoint and complete the schedule.

Pins three durability properties:

* **checkpoint durability under kill**: the tmp+atomic-rename write (sync
  and async writer alike) means ``checkpoint.ckpt`` is always a COMPLETE
  payload — whatever instant the process died, what's on disk parses;
* **resume restores progress**: completed epochs are not re-trained; the
  resumed run appends exactly the remaining epochs and finishes the
  schedule (final checkpoint at the last epoch, optimizer state present);
* **torn-write debris is ignored**: an orphaned half-written
  ``checkpoint.ckpt.tmp`` left by a kill mid-write does not break resume.
"""

import json
import os
import signal
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

FLAGS = [
    "--combine_datasets", "synthetic",
    "--combine_datasets_val", "synthetic",
    "--epochs", "3",
    "--eval_skip", "10",  # no eval: keep the kill window inside training
    "--async_checkpoint",
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
    "--batch_size", "4",
    "--num_workers", "0",
]


def _env():
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_COMPILATION_CACHE_DIR"] = os.path.join(
        os.environ.get("TMPDIR", "/tmp"), "tubedetr_crash_resume_jaxcache"
    )
    return env


def _epochs_logged(out_dir) -> list:
    log = os.path.join(str(out_dir), "log.txt")
    if not os.path.exists(log):
        return []
    with open(log) as f:
        return [json.loads(line)["epoch"] for line in f if line.strip()]


def test_sigkill_mid_training_then_resume(tmp_path):
    from tubedetr_tpu.train.checkpoint import load_checkpoint

    out = tmp_path / "out"
    argv = [sys.executable, "-m", "tubedetr_tpu.apps.train", *FLAGS,
            "--output-dir", str(out)]
    p = subprocess.Popen(
        argv, env=_env(), cwd=REPO,
        stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    ck = out / "checkpoint.ckpt"
    deadline = time.time() + 1200
    try:
        while time.time() < deadline:
            if ck.exists():
                break
            if p.poll() is not None:
                raise AssertionError(
                    "train CLI exited before its first checkpoint:\n"
                    + p.communicate()[0][-3000:]
                )
            time.sleep(0.2)
        else:
            raise AssertionError("no checkpoint appeared within the deadline")
        # preempt: SIGKILL the instant the first checkpoint is durable —
        # epoch 1 is mid-flight and the async writer may still be running
        os.kill(p.pid, signal.SIGKILL)
    finally:
        if p.poll() is None and time.time() >= deadline:
            p.kill()
        p.wait(timeout=60)
        if p.stdout is not None:
            p.stdout.close()

    # --- durability: whatever instant we killed, the checkpoint parses ---
    saved = load_checkpoint(str(ck))
    saved_epoch = saved["epoch"]
    assert saved_epoch in (0, 1), saved_epoch
    assert saved.get("opt_state") is not None

    pre_resume_epochs = _epochs_logged(out)

    # --- torn-write debris: a kill mid-write leaves an orphaned .tmp ----
    (out / "checkpoint.ckpt.tmp").write_bytes(b"torn half-written garbage")

    # --- resume and finish the schedule ---------------------------------
    p2 = subprocess.run(
        argv + ["--resume", str(ck)],
        env=_env(), cwd=REPO, capture_output=True, text=True, timeout=1200,
    )
    assert p2.returncode == 0, (p2.stdout + p2.stderr)[-3000:]

    final = load_checkpoint(str(ck))
    assert final["epoch"] == 2  # the full --epochs 3 schedule completed
    assert final.get("opt_state") is not None

    # the resumed run appended exactly the REMAINING epochs — completed
    # epochs were not re-trained
    appended = _epochs_logged(out)[len(pre_resume_epochs):]
    assert appended == list(range(saved_epoch + 1, 3)), (
        pre_resume_epochs, appended, saved_epoch
    )
