"""End-to-end device benchmark: RRC + register + resample + stitch.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": "Gpix/s", "vs_baseline": N/2.0}

Baseline (BASELINE.json north star): >= 2 Gpix/s/chip end-to-end.  The
benchmark holds a synthetic full-width scene in HBM and times the full
device pipeline of the default command plus the prestitch/stitch legs:

  RRC(PAN) -> RRC(4 MSS bands) -> phase-correlation registration
  (sections x slices tile batch) -> per-band alignment resample ->
  constant-shift prestitch resample of the second CMOS -> seam concat.

Pixels counted = every pixel ingested by the pipeline (PAN + MSS + PAN2),
matching the reference's own MB/s accounting which instruments each stage
over its input bytes.
"""

from __future__ import annotations

import json
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
    from opticalimageprocessor_tpu.ops import phasecorr, resample, rrc
    from opticalimageprocessor_tpu.ops.resample import remap_band_fast_chunked
    from opticalimageprocessor_tpu.parallel.sharded import _fit_poly

    import os

    on_tpu = any(d.platform == "tpu" for d in jax.devices())
    if on_tpu:
        # OIP_BENCH_LINES scales the HBM-resident scene (BASELINE config 5:
        # multi-GB strips); registration sections follow the reference's
        # sampling (16000-line windows, as many as fit up to 5)
        lines_pan = int(os.environ.get("OIP_BENCH_LINES", 32768))
        slices, n_iters = 10, 8
    else:  # CI/CPU smoke mode
        lines_pan, slices, n_iters = 2048, 8, 2
    lines_mss = lines_pan // MSS_BANDS
    corr_rows = min(lines_pan, 16000)
    n_sections = max(1, min(5, lines_pan // 16000)) if on_tpu else 1

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
    k = 0.98 + 0.04 * rng.random(PIXELS_PER_LINE)
    b = rng.normal(0, 20, PIXELS_PER_LINE)
    pan_params = jnp.asarray(rrc.split_rrc_params(k, b))
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

    cols = PIXELS_PER_LINE // slices
    bcols = cols // MSS_BANDS
    brows = corr_rows // MSS_BANDS

    from opticalimageprocessor_tpu.ops.cv_exact import get_optimal_dft_size

    # fast mode: correlation length = the tile itself (no optimal-size pad),
    # so the band side can use the spectral upsample identity
    pad = (corr_rows, cols) if on_tpu else (
        get_optimal_dft_size(corr_rows), get_optimal_dft_size(cols)
    )
    use_mxu = on_tpu
    if on_tpu:
        from opticalimageprocessor_tpu.ops import fft_mxu

        fft_mxu.set_stage_dtype(jnp.bfloat16)  # fast mode: <2e-3 px effect

    sec_stride = max(
        1, (lines_pan - corr_rows) // max(1, n_sections - 1) if n_sections > 1 else 0
    )

    def register(pan_c, mss_c):
        # one (section, slice) tile at a time (lax.map) so HBM holds one
        # tile's transform working set; the PAN tile's forward FFT is shared
        # by all 4 bands.  Sections sample different row windows like the
        # reference (preproc.h:245-259).
        def one_slice(idx):
            sec = idx // slices
            i = idx % slices
            row0 = sec * sec_stride
            pt = jax.lax.dynamic_slice(
                pan_c, (row0, i * cols), (corr_rows, cols)
            ).astype(jnp.float32)
            far, fai = phasecorr.rfft2_padded(pt, pad, use_mxu)
            outs = []
            for band in range(MSS_BANDS):
                bt = jax.lax.dynamic_slice(
                    mss_c, (band, row0 // MSS_BANDS, i * bcols),
                    (1, brows, bcols),
                )[0]
                if use_mxu:
                    # spectral upsample: F_up = H * tiled(F_band) — 16x
                    # cheaper than upsample + full-size transform
                    fbr, fbi = phasecorr.upsampled_band_spectrum(bt)
                else:
                    up = resample.upsample4_f32(bt.astype(jnp.float32))
                    fbr, fbi = phasecorr.rfft2_padded(up, pad, use_mxu)
                outs.append(
                    phasecorr.peak_from_spectra_windowed(
                        far, fai, fbr, fbi, pad, 64, 64
                    )
                )
            dxs = jnp.stack([o[0] for o in outs])
            dys = jnp.stack([o[1] for o in outs])
            rss = jnp.stack([o[2] for o in outs])
            return dxs, dys, rss

        dx, dy, rs = jax.lax.map(
            one_slice, jnp.arange(n_sections * slices)
        )
        dx = dx.reshape(n_sections * slices, MSS_BANDS).T
        dy = dy.reshape(n_sections * slices, MSS_BANDS).T
        rs = rs.reshape(n_sections * slices, MSS_BANDS).T
        cx = jnp.tile(
            (jnp.arange(slices) * cols + cols // 2).astype(jnp.float32),
            n_sections,
        )
        coeffs = []
        for band in range(MSS_BANDS):
            w = (rs[band] >= 0.0).astype(jnp.float32)  # noise scene: keep all
            coeffs.append(
                (_fit_poly(cx, dx[band], 1, w), _fit_poly(cx, dy[band], 2, w))
            )
        return coeffs

    fold = 200
    import os
    stages = os.environ.get("OIP_BENCH_STAGES", "rrc,reg,remap,prestt").split(",")

    @jax.jit
    def pipeline(pan, mss, pan_params, mss_params):
        if "rrc" in stages:
            pan_c = rrc.rrc_apply(pan, pan_params)
            mss_c = jnp.stack(
                [rrc.rrc_apply(mss[i], mss_params[i]) for i in range(MSS_BANDS)]
            )
        else:
            pan_c, mss_c = pan, mss
        if "reg" in stages:
            coeffs = register(pan_c, mss_c)
        else:
            coeffs = [
                (jnp.asarray([1.5, 2.5e-4], jnp.float32),
                 jnp.asarray([-0.75, 1e-4, 1e-8], jnp.float32))
            ] * MSS_BANDS
        if "remap" in stages:
            aligned = jnp.stack(
                [
                    remap_band_fast_chunked(
                        mss_c[i], coeffs[i][0], coeffs[i][1],
                        chunk_rows=1024, row_bound=3,
                    )
                    for i in range(MSS_BANDS)
                ],
                axis=-1,
            )
        else:
            aligned = jnp.stack([mss_c[i] for i in range(MSS_BANDS)], axis=-1)
        # prestitch: constant-shift resample of the second CMOS PAN
        if "prestt" in stages:
            zero2 = jnp.asarray([1.5, 0.0], jnp.float32)
            zeroy = jnp.asarray([-0.75, 0.0, 0.0], jnp.float32)
            prestt = remap_band_fast_chunked(
                pan_c, zero2, zeroy, chunk_rows=1024, row_bound=3
            )
        else:
            prestt = pan_c
        # stitch: seam concat of the two halves
        stitched = jnp.concatenate(
            [pan_c[:, : PIXELS_PER_LINE - fold], prestt[:, fold:]], axis=1
        )
        return aligned, stitched

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
        # force a real device->host readback so async/tunnel execution can't
        # report completion early
        _ = np.asarray(out[0][it % 7, it % 5])
        times.append(time.perf_counter() - t0)
    dt = float(np.median(times))
    import sys
    print('times:', [round(t, 4) for t in times], file=sys.stderr)

    px = (
        lines_pan * PIXELS_PER_LINE            # PAN RRC+stitch path
        + MSS_BANDS * lines_mss * PIXELS_PER_MSSBAND  # MSS RRC+align
        + lines_pan * PIXELS_PER_LINE          # prestitch PAN2
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
