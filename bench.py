"""End-to-end device benchmark: RRC + register + resample + stitch.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Gpix/s/chip", "vs_baseline": N/2.0}

Baseline (BASELINE.json north star): >= 2 Gpix/s/chip.  Runs the library's
fused device pipeline (models/device_pipeline.make_device_pipeline) on a
synthetic HBM-resident scene: RRC both sensors, sections x slices
registration sampling, 4-band alignment resample, prestitch resample,
seam concat.  OIP_BENCH_LINES scales the scene (default 32768 lines;
65536 = the multi-GB BASELINE config).

Pixels counted = every pixel ingested by the pipeline (PAN + MSS + PAN2),
matching the reference's own MB/s accounting which instruments each stage
over its input bytes.
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


def main() -> None:
    import jax
    import jax.numpy as jnp

    from opticalimageprocessor_tpu.constants import (
        MSS_BANDS,
        PIXELS_PER_LINE,
        PIXELS_PER_MSSBAND,
    )
    from opticalimageprocessor_tpu.models.device_pipeline import (
        make_device_pipeline,
    )
    from opticalimageprocessor_tpu.ops import rrc

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        from opticalimageprocessor_tpu.ops import fft_mxu

        fft_mxu.set_stage_dtype(jnp.bfloat16)  # fast mode: <2e-3 px effect
        lines_pan = int(os.environ.get("OIP_BENCH_LINES", 32768))
        slices, n_iters = 10, 8
    else:  # CI/CPU smoke mode
        lines_pan, slices, n_iters = 2048, 8, 2
    lines_mss = lines_pan // MSS_BANDS

    rng = np.random.default_rng(0)
    pan = jnp.asarray(
        rng.integers(0, 65536, (lines_pan, PIXELS_PER_LINE), dtype=np.uint16)
    )
    mss = jnp.asarray(
        rng.integers(
            0, 65536, (MSS_BANDS, lines_mss, PIXELS_PER_MSSBAND),
            dtype=np.uint16,
        )
    )
    pan_params = jnp.asarray(
        rrc.split_rrc_params(
            0.98 + 0.04 * rng.random(PIXELS_PER_LINE),
            rng.normal(0, 20, PIXELS_PER_LINE),
        )
    )
    mss_params = jnp.asarray(
        np.stack(
            [
                rrc.split_rrc_params(
                    0.98 + 0.04 * rng.random(PIXELS_PER_MSSBAND),
                    rng.normal(0, 20, PIXELS_PER_MSSBAND),
                )
                for _ in range(MSS_BANDS)
            ]
        )
    )

    pipeline = make_device_pipeline(slices=slices)

    out = pipeline(pan, mss, pan_params, mss_params)
    jax.block_until_ready(out)
    # force a readback: through the TPU tunnel block_until_ready can return
    # before execution fully completes, which would push warmup cost into
    # the first timed iteration
    _ = np.asarray(out[0][0, 0])

    times = []
    for it in range(n_iters):
        t0 = time.perf_counter()
        out = pipeline(pan, mss, pan_params, mss_params)
        jax.block_until_ready(out)
        _ = np.asarray(out[0][it % 7, it % 5])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    import sys

    print("times:", [round(t, 4) for t in times], file=sys.stderr)

    px = (
        lines_pan * PIXELS_PER_LINE                   # PAN RRC+stitch path
        + MSS_BANDS * lines_mss * PIXELS_PER_MSSBAND  # MSS RRC+align
        + lines_pan * PIXELS_PER_LINE                 # prestitch PAN2
    )
    gpix = px / dt / 1e9
    print(
        json.dumps(
            {
                "metric": "e2e RRC+register+resample+stitch throughput",
                "value": round(gpix, 3),
                "unit": "Gpix/s/chip",
                "vs_baseline": round(gpix / 2.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
