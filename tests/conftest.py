"""Test configuration: run everything on a virtual 8-device CPU mesh.

Must set the env vars before the first ``import jax`` anywhere in the test
process — conftest is imported before test modules, so do it here.
"""

import os
import tempfile

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
# CLI tests enable the persistent XLA compile cache (cli._enable_compile
# _cache) for the whole process; point it at a per-session temp dir so test
# runs never deserialise executables cached by earlier runs/configurations
os.environ["OIP_JAX_CACHE"] = tempfile.mkdtemp(prefix="oiptpu_jax_test_")

import jax  # noqa: E402

# The hosted TPU tunnel plugin ignores the JAX_PLATFORMS env var; the config
# knob is authoritative.  Tests always run on an 8-device virtual CPU mesh.
jax.config.update("jax_platforms", "cpu")

import faulthandler  # noqa: E402

import numpy as np  # noqa: E402
import pytest  # noqa: E402

# Per-test hang watchdog (pytest-timeout is not in this image).  A hung
# device call blocks the main thread at the C level, where neither pytest
# nor signal handlers can interrupt; faulthandler's watchdog THREAD still
# fires — it dumps every stack and hard-exits, failing CI fast instead of
# stalling it.  Generous default: the 1-core CI host legitimately spends
# minutes in single tests during sporadic slow phases.
_TEST_TIMEOUT = float(os.environ.get("OIP_TEST_TIMEOUT", 900))


@pytest.fixture(autouse=True)
def _hang_watchdog():
    if _TEST_TIMEOUT > 0:
        faulthandler.dump_traceback_later(_TEST_TIMEOUT, exit=True)
    yield
    if _TEST_TIMEOUT > 0:
        faulthandler.cancel_dump_traceback_later()


@pytest.fixture
def rng():
    return np.random.default_rng(1234)
