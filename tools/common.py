"""Shared helpers for the perf tools: platform forcing + forced-readback
timing (docs/PERF.md methodology — block_until_ready can return early
through the TPU tunnel, so every timed iteration reads a scalar back)."""

from __future__ import annotations

import os
import time

import numpy as np


def ensure_platform() -> None:
    """Honor OIP_JAX_PLATFORM (the axon plugin ignores the JAX_PLATFORMS
    env var; the jax_platforms config knob wins — cli.py does the same).
    Call BEFORE any jax device use."""
    if os.environ.get("OIP_JAX_PLATFORM"):
        import jax

        jax.config.update("jax_platforms", os.environ["OIP_JAX_PLATFORM"])


def timeit(fn, args, n=5):
    """(min_ms, median_ms) of n calls, each blocked AND read back (every
    output leaf's first element) so tunnel-deferred execution is counted."""
    import jax

    def sync(out):
        # one scalar readback forces completion of the whole executable
        # (all outputs finish together); reading every leaf would add one
        # tunnel round trip per leaf to the measurement
        jax.block_until_ready(out)
        leaf = jax.tree.leaves(out)[0]
        _ = np.asarray(leaf.reshape(-1)[0])

    sync(fn(*args))
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        sync(fn(*args))
        ts.append(time.perf_counter() - t0)
    return min(ts) * 1e3, float(np.median(ts)) * 1e3
