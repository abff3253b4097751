"""Test configuration: force a virtual 8-device CPU mesh.

Sharding tests exercise pjit over a Mesh without TPU hardware (SURVEY.md §4).

This environment pre-imports jax via a sitecustomize hook that registers the
tunneled axon TPU backend whenever ``PALLAS_AXON_POOL_IPS`` is set, and pins
``JAX_PLATFORMS=axon``; merely overriding the env var here deadlocks the
axon claim loop. So we *re-exec* the whole pytest process with the axon
variables scrubbed — the fresh interpreter skips TPU registration entirely
and runs on an 8-device CPU host platform.

The re-exec happens in ``pytest_configure`` (not at import) so pytest's
fd-level capture can be suspended first — otherwise the child's entire
output lands in the parent's discarded capture tempfile and the run looks
silent. The exec'd child keeps the parent's pid, so exit codes propagate to
whatever invoked pytest.
"""

import os
import sys

_REEXEC_FLAG = "_TUBEDETR_TEST_REEXEC"


def _needs_reexec() -> bool:
    return bool(
        os.environ.get("PALLAS_AXON_POOL_IPS")
        and os.environ.get(_REEXEC_FLAG) != "1"
    )


def _scrubbed_env() -> dict:
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env[_REEXEC_FLAG] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    return env


def pytest_configure(config):
    if not _needs_reexec():
        return
    capman = config.pluginmanager.getplugin("capturemanager")
    if capman is not None:
        try:
            capman.suspend_global_capture(in_=True)
            capman.stop_global_capturing()
        except Exception:
            pass
    print("[conftest] re-exec with TPU tunnel env scrubbed (CPU x8)",
          file=sys.stderr, flush=True)
    sys.stdout.flush()
    sys.stderr.flush()
    args = [sys.executable, "-m", "pytest", *config.invocation_params.args]
    os.execve(sys.executable, args, _scrubbed_env())


if not _needs_reexec():
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pytest  # noqa: E402


@pytest.fixture(scope="session")
def rng():
    import jax

    return jax.random.PRNGKey(0)
