"""Same-process A/B of the transpose-free FFT structures on the register
stage (docs/PERF.md queued measurement): times jitted register_fast and a
lone PAN-tile rfft2 under set_transpose_free(False) then (True), three
interleaved rounds each, on the current backend.

Usage: OIP_JAX_PLATFORM=... python tools/ab_fft.py [--lines 32768]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import ensure_platform, timeit  # noqa: E402

ensure_platform()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=32768)
    ap.add_argument("--n", type=int, default=3)
    a = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from opticalimageprocessor_tpu.constants import (
        MSS_BANDS,
        PIXELS_PER_LINE,
        PIXELS_PER_MSSBAND,
    )
    from opticalimageprocessor_tpu.models.device_pipeline import register_fast
    from opticalimageprocessor_tpu.ops import fft_mxu, phasecorr

    if jax.default_backend() == "tpu":
        fft_mxu.set_stage_dtype(jnp.bfloat16)  # bench.py's fast mode

    rng = np.random.default_rng(0)
    pan = jnp.asarray(
        rng.integers(0, 65535, (a.lines, PIXELS_PER_LINE), np.uint16)
    )
    mss = jnp.asarray(
        rng.integers(
            0, 65535,
            (MSS_BANDS, a.lines // MSS_BANDS, PIXELS_PER_MSSBAND), np.uint16,
        )
    )
    corr_rows, cols = min(16000, a.lines), PIXELS_PER_LINE // 10
    tile = jnp.asarray(
        rng.integers(0, 65535, (corr_rows, cols), np.uint16)
    ).astype(jnp.float32)

    # separate jits per mode: set_transpose_free changes trace-time
    # structure, so each mode needs its own compiled executable
    def make(tf):
        reg = jax.jit(
            lambda p, m, tf=tf: (
                fft_mxu.set_transpose_free(tf),
                register_fast(p, m),
            )[1][1]
        )
        fft = jax.jit(
            lambda t, tf=tf: (
                fft_mxu.set_transpose_free(tf),
                phasecorr.rfft2_padded(t, (corr_rows, cols), True),
            )[1][0]
        )
        return reg, fft

    # NOTE: set_transpose_free is a python-level switch read at trace
    # time; calling it inside the lambda guarantees the right mode even
    # if tracing is deferred.  Build each mode's executables ONCE (a jit
    # wrapper recompiles per function object), interleave timing rounds
    # so host slow phases hit both modes.
    fns = {tf: make(tf) for tf in (False, True)}
    for rnd in range(3):
        for tf in (False, True):
            reg, fft = fns[tf]
            mn, md = timeit(reg, (pan, mss), a.n)
            mn2, md2 = timeit(fft, (tile,), a.n)
            print(
                f"round {rnd} transpose_free={tf}: register min={mn:.1f} "
                f"med={md:.1f} ms | pan rfft2 min={mn2:.2f} med={md2:.2f} ms"
            )
    fft_mxu.set_transpose_free(None)


if __name__ == "__main__":
    main()
