"""Test configuration: force a virtual 8-device CPU mesh.

Sharding tests exercise pjit over a Mesh without TPU hardware (SURVEY.md §4).

This environment pre-imports jax via a sitecustomize hook that registers the
tunneled axon TPU backend whenever ``PALLAS_AXON_POOL_IPS`` is set, and pins
``JAX_PLATFORMS=axon``; merely overriding the env var here deadlocks the
axon claim loop. So on first import we *re-exec* the whole pytest process
with the axon variables scrubbed — the fresh interpreter skips TPU
registration entirely and runs on an 8-device CPU host platform.
"""

import os
import sys

_REEXEC_FLAG = "_TUBEDETR_TEST_REEXEC"

if os.environ.get("PALLAS_AXON_POOL_IPS") and os.environ.get(_REEXEC_FLAG) != "1":
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env[_REEXEC_FLAG] = "1"
    env["JAX_PLATFORMS"] = "cpu"
    flags = env.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        env["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
    os.execve(
        sys.executable, [sys.executable, "-m", "pytest", *sys.argv[1:]], env
    )

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
