"""The jax.profiler observability hooks actually produce traces (VERDICT r4
weak #5: a dead profiling hook is worse than none).

``maybe_profile`` wraps a whole block (bench.py's timed loop);
``ProfileWindow`` traces a bounded step window inside the train epoch loop
(train/engine.py). Both are driven here on CPU; the hardware leg is
TUBEDETR_PROFILE_DIR=... python bench.py (docs/NOTES.md records the tunnel
finding).
"""

import os

import numpy as np
import pytest


def _trace_files(trace_dir):
    out = []
    for root, _dirs, files in os.walk(trace_dir):
        out += [os.path.join(root, f) for f in files]
    return out


@pytest.mark.quick
def test_maybe_profile_writes_trace(tmp_path):
    import jax
    import jax.numpy as jnp

    from tubedetr_tpu.utils.misc import maybe_profile

    trace_dir = str(tmp_path / "trace")
    f = jax.jit(lambda x: jnp.sum(x * x))
    with maybe_profile(trace_dir):
        float(f(jnp.arange(1024.0)))
    files = _trace_files(trace_dir)
    assert files, "no trace files written"
    assert any(f.endswith(".xplane.pb") for f in files), files


def test_maybe_profile_disabled_is_noop(tmp_path, monkeypatch):
    monkeypatch.delenv("TUBEDETR_PROFILE_DIR", raising=False)
    from tubedetr_tpu.utils.misc import maybe_profile

    with maybe_profile():
        pass  # no env, no arg -> must not start the profiler


@pytest.mark.quick
def test_profile_window_step_bounds(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from tubedetr_tpu.utils.misc import ProfileWindow

    trace_dir = str(tmp_path / "wtrace")
    monkeypatch.setenv("TUBEDETR_PROFILE_DIR", trace_dir)
    monkeypatch.setenv("TUBEDETR_PROFILE_START", "1")
    monkeypatch.setenv("TUBEDETR_PROFILE_STEPS", "2")
    w = ProfileWindow()
    f = jax.jit(lambda x: x @ x.T)
    x = jnp.asarray(np.random.RandomState(0).randn(16, 16), jnp.float32)
    for i in range(5):
        w.step(i)
        if i == 0:
            assert not w._active  # start=1 skips the compile step
        if i in (1, 2):
            assert w._active
        if i >= 3:
            assert w._done and not w._active
        float(jnp.sum(f(x)))
    w.close()
    assert _trace_files(trace_dir), "window produced no trace"


def test_profile_window_short_epoch_closes(tmp_path, monkeypatch):
    import jax
    import jax.numpy as jnp

    from tubedetr_tpu.utils.misc import ProfileWindow

    trace_dir = str(tmp_path / "short")
    monkeypatch.setenv("TUBEDETR_PROFILE_DIR", trace_dir)
    monkeypatch.setenv("TUBEDETR_PROFILE_STEPS", "100")
    w = ProfileWindow()
    w.step(1)
    float(jnp.sum(jax.jit(lambda x: x + 1)(jnp.zeros(8))))
    w.close()  # epoch ended before the window filled
    assert not w._active
    assert _trace_files(trace_dir)


def test_profile_window_disabled(monkeypatch):
    monkeypatch.setenv("TUBEDETR_PROFILE_DIR", "/tmp/should-not-exist-xyz")
    from tubedetr_tpu.utils.misc import ProfileWindow

    w = ProfileWindow(enabled=False)
    assert w.trace_dir == ""
    w.step(1)  # no-op
    w.close()

    monkeypatch.setenv("TUBEDETR_PROFILE_START", "zzz")  # malformed env
    w2 = ProfileWindow(enabled=True)
    assert (w2.start, w2.steps) == (1, 3)
