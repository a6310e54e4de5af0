"""The fused single-chip device pipeline (the framework's flagship model).

One jitted program covering the whole per-scene compute chain of the
reference's default + prestitch + stitch commands, HBM-resident end to end:

  RRC(PAN) + RRC(4 x MSS)                      # Pallas kernel
  -> registration: sections x slices sampling grid, PAN tile spectrum
     shared across bands, spectral band upsample, windowed correlation
     peak (ops/fft_mxu + ops/phasecorr fast paths)
  -> weighted polynomial shift fit (on device)
  -> 4-band alignment resample + prestitch constant-shift resample
     (blocked-MXU remap, lax.map row-chunk streaming)
  -> CMOS seam concat

This is the throughput path measured by bench.py (3.4 Gpix/s/chip on one
v5e at a 32768-line scene; remap chunk_rows tuned for HBM locality).  The host-orchestrated models
(PreProcessor/Stitcher) remain the parity-exact route with file IO and the
reference's sectioning semantics; this pipeline trades those for the
documented fast-mode envelope (see ops/resample.remap_band_fast,
ops/phasecorr.peak_from_spectra_windowed).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..constants import CORRELATION_LINES, MSS_BANDS, PIXELS_PER_LINE
from ..ops import phasecorr, resample, rrc
from ..ops.cv_exact import get_optimal_dft_size
from ..parallel.sharded import _fit_poly


def register_fast(
    pan_c: jax.Array,
    mss_c: jax.Array,
    slices: int = 10,
    n_sections: int | None = None,
    win: tuple[int, int] = (64, 64),
    exact_sizes: bool = False,
):
    """Fast registration: per-(section, slice) windowed phase correlation.

    ``pan_c``: (L_pan, W) uint16 (RRC'd); ``mss_c``: (4, L_mss, W/4) uint16.
    Returns per-band (coeff_x[2], coeff_y[3]) fitted on the device.

    Fast-mode choices (vs models.preprocessor's parity registration): the
    correlation length equals the tile (no optimal-DFT padding) so the band
    side uses the spectral-upsample identity, and the peak search is
    restricted to ``win`` — deviations measured ~0.015 px.
    ``exact_sizes=True`` restores the OpenCV padding and explicit upsample.
    """
    lines_pan, width = pan_c.shape
    corr_rows = min(lines_pan, CORRELATION_LINES)
    if n_sections is None:
        n_sections = max(1, min(5, lines_pan // CORRELATION_LINES))
    cols = width // slices
    bcols = cols // MSS_BANDS
    brows = corr_rows // MSS_BANDS
    if exact_sizes:
        pad = (get_optimal_dft_size(corr_rows), get_optimal_dft_size(cols))
    else:
        pad = (corr_rows, cols)
    sec_stride = (
        (lines_pan - corr_rows) // max(1, n_sections - 1)
        if n_sections > 1
        else 0
    )

    def one_slice(idx):
        sec = idx // slices
        i = idx % slices
        row0 = sec * sec_stride
        pt = jax.lax.dynamic_slice(
            pan_c, (row0, i * cols), (corr_rows, cols)
        ).astype(jnp.float32)
        far, fai = phasecorr.rfft2_padded(pt, pad, True)
        outs = []
        for band in range(MSS_BANDS):
            bt = jax.lax.dynamic_slice(
                mss_c, (band, row0 // MSS_BANDS, i * bcols), (1, brows, bcols)
            )[0]
            if exact_sizes:
                up = resample.upsample4_f32(bt.astype(jnp.float32))
                fbr, fbi = phasecorr.rfft2_padded(up, pad, True)
            else:
                fbr, fbi = phasecorr.upsampled_band_spectrum(bt)
            outs.append(
                phasecorr.peak_from_spectra_windowed(
                    far, fai, fbr, fbi, pad, win[0], win[1]
                )
            )
        return (
            jnp.stack([o[0] for o in outs]),
            jnp.stack([o[1] for o in outs]),
            jnp.stack([o[2] for o in outs]),
        )

    dx, dy, rs = jax.lax.map(one_slice, jnp.arange(n_sections * slices))
    dx = dx.reshape(n_sections * slices, MSS_BANDS).T
    dy = dy.reshape(n_sections * slices, MSS_BANDS).T
    rs = rs.reshape(n_sections * slices, MSS_BANDS).T
    cx = jnp.tile(
        (jnp.arange(slices) * cols + cols // 2).astype(jnp.float32),
        n_sections,
    )
    coeffs = []
    for band in range(MSS_BANDS):
        w = (rs[band] >= 0.0).astype(jnp.float32)
        coeffs.append(
            (_fit_poly(cx, dx[band], 1, w), _fit_poly(cx, dy[band], 2, w))
        )
    return coeffs


def make_device_pipeline(
    slices: int = 10,
    n_sections: int | None = None,
    fold: int = 200,
    chunk_rows: int = 256,
    row_bound: int = 3,
    prestitch_shift: tuple[float, float] = (1.5, -0.75),
):
    """Build the jitted full device pipeline.

    signature: (pan u16 (L, 12288), mss u16 (4, L/4, 3072),
                pan_params (6, 12288) f32, mss_params (4, 6, 3072) f32)
             -> (aligned u16 (L/4, 3072, 4), stitched u16 (L, 2*(12288-fold)))
    """

    @jax.jit
    def pipeline(pan, mss, pan_params, mss_params):
        pan_c = rrc.rrc_apply(pan, pan_params)
        mss_c = jnp.stack(
            [rrc.rrc_apply(mss[i], mss_params[i]) for i in range(MSS_BANDS)]
        )
        coeffs = register_fast(pan_c, mss_c, slices, n_sections)
        aligned = jnp.stack(
            [
                resample.remap_band_fast_chunked(
                    mss_c[i], coeffs[i][0], coeffs[i][1],
                    chunk_rows=chunk_rows, row_bound=row_bound,
                )
                for i in range(MSS_BANDS)
            ],
            axis=-1,
        )
        dxs, dys = prestitch_shift
        prestt = resample.remap_band_fast_chunked(
            pan_c,
            jnp.asarray([4.0 * dxs, 0.0], jnp.float32),
            jnp.asarray([4.0 * dys, 0.0, 0.0], jnp.float32),
            chunk_rows=chunk_rows,
            row_bound=row_bound,
        )
        stitched = jnp.concatenate(
            [pan_c[:, : PIXELS_PER_LINE - fold], prestt[:, fold:]], axis=1
        )
        return aligned, stitched

    return pipeline
