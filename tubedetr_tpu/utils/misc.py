"""Small utilities: git-SHA banner, inverse sigmoid, profiler hooks.

Equivalents of the leftover /root/reference/util/misc.py helpers that are not
superseded by the static-shape collate (NestedTensor and video_collate_fn
live in tubedetr_tpu/data/collate.py).
"""

from __future__ import annotations

import os
import subprocess
from contextlib import contextmanager

import jax.numpy as jnp


def get_sha() -> str:
    """'sha (status), branch' banner (/root/reference/util/misc.py:19-37)."""
    cwd = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    def run(cmd):
        try:
            return (
                subprocess.check_output(cmd, cwd=cwd, stderr=subprocess.DEVNULL)
                .decode("ascii")
                .strip()
            )
        except Exception:
            return "N/A"

    sha = run(["git", "rev-parse", "HEAD"])
    diff = run(["git", "diff-index", "HEAD"])
    branch = run(["git", "rev-parse", "--abbrev-ref", "HEAD"])
    status = "clean" if diff in ("", "N/A") else "has uncommitted changes"
    return f"sha: {sha}, status: {status}, branch: {branch}"


def inverse_sigmoid(x: jnp.ndarray, eps: float = 1e-5) -> jnp.ndarray:
    x = jnp.clip(x, 0.0, 1.0)
    x1 = jnp.clip(x, min=eps)
    x2 = jnp.clip(1 - x, min=eps)
    return jnp.log(x1 / x2)


@contextmanager
def maybe_profile(trace_dir: str = ""):
    """jax.profiler trace capture when TUBEDETR_PROFILE_DIR (or the argument)
    is set — the TPU upgrade over the reference's hand-rolled timing-only
    observability (SURVEY.md §5.1). Wraps a whole block (bench.py uses it
    around the timed iterations); for a bounded per-step window inside a
    training loop use :class:`ProfileWindow`."""
    trace_dir = trace_dir or os.environ.get("TUBEDETR_PROFILE_DIR", "")
    if not trace_dir:
        yield
        return
    import jax

    jax.profiler.start_trace(trace_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class ProfileWindow:
    """Trace a bounded window of training steps with jax.profiler.

    Enabled by TUBEDETR_PROFILE_DIR; the window is steps
    [TUBEDETR_PROFILE_START, +TUBEDETR_PROFILE_STEPS) of the epoch it is
    constructed for (defaults: start 1 — skipping the compile step —
    3 steps). Call ``step(i)`` with the in-epoch step index before each
    step and ``close()`` after the loop (also stops a window the epoch was
    too short to finish)."""

    def __init__(self, trace_dir: str = "", enabled: bool = True):
        self.trace_dir = trace_dir or os.environ.get(
            "TUBEDETR_PROFILE_DIR", ""
        )
        if not enabled:
            self.trace_dir = ""
        try:
            self.start = int(os.environ.get("TUBEDETR_PROFILE_START", "1"))
            self.steps = int(os.environ.get("TUBEDETR_PROFILE_STEPS", "3"))
        except ValueError:
            self.start, self.steps = 1, 3
        self._active = False
        self._done = False

    def step(self, i: int) -> None:
        if not self.trace_dir or self._done:
            return
        import jax

        if not self._active and i >= self.start:
            jax.profiler.start_trace(self.trace_dir)
            self._active = True
            print(f"[profile] tracing steps {i}..{i + self.steps - 1} "
                  f"-> {self.trace_dir}")
        elif self._active and i >= self.start + self.steps:
            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            print(f"[profile] trace written to {self.trace_dir}")

    def close(self) -> None:
        if self._active:
            import jax

            jax.profiler.stop_trace()
            self._active = False
            self._done = True
            print(f"[profile] trace written to {self.trace_dir}")
