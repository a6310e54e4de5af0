"""Phase-correlation op: parity vs cv2/oracle and batch consistency."""

import numpy as np
import pytest

from opticalimageprocessor_tpu.ops import cv_exact, phasecorr


def test_phase_correlate_integer_shift(rng):
    base = (rng.random((128, 160)) * 1000).astype(np.float32)
    shifted = np.roll(np.roll(base, 5, axis=1), -3, axis=0)
    dx, dy, resp = phasecorr.phase_correlate(base, shifted)
    assert abs(dx - 5.0) < 0.05
    assert abs(dy - (-3.0)) < 0.05
    assert resp > 0.9


def test_phase_correlate_matches_oracle_f32(rng):
    a = (rng.random((96, 200)) * 500).astype(np.float32)
    b = np.roll(a, 2, axis=1) + rng.normal(0, 5, a.shape).astype(np.float32)
    dx, dy, resp = phasecorr.phase_correlate(a, b)
    odx, ody, oresp = cv_exact.phase_correlate(a, b, precision=np.float32)
    assert abs(dx - odx) < 1e-3
    assert abs(dy - ody) < 1e-3
    assert abs(resp - oresp) < 1e-3


def test_phase_correlate_matches_cv2(rng):
    cv2 = pytest.importorskip("cv2")
    a = (rng.random((150, 201)) * 1000).astype(np.float32)
    m = np.float32([[1, 0, -2.4], [0, 1, 1.3]])
    b = cv2.warpAffine(a, m, (201, 150), flags=cv2.INTER_LINEAR)
    (cdx, cdy), cresp = cv2.phaseCorrelate(a, b)
    dx, dy, resp = phasecorr.phase_correlate(a, b)
    assert abs(dx - cdx) < 2e-3
    assert abs(dy - cdy) < 2e-3
    assert abs(resp - cresp) < 1e-3


def test_phase_correlate_batch_matches_single(rng):
    a = (rng.random((6, 64, 80)) * 100).astype(np.float32)
    b = np.stack([np.roll(x, i % 3, axis=1) for i, x in enumerate(a)])
    dxs, dys, rs = phasecorr.phase_correlate_batch(a, b)
    for i in range(a.shape[0]):
        dx, dy, r = phasecorr.phase_correlate(a[i], b[i])
        assert abs(float(dxs[i]) - dx) < 1e-5
        assert abs(float(dys[i]) - dy) < 1e-5
        assert abs(float(rs[i]) - r) < 1e-5


def test_polyfit_recovers_model(rng):
    from opticalimageprocessor_tpu.ops import polyfit

    cx = np.linspace(100, 12000, 40)
    dx = 0.5 + 1e-4 * cx + rng.normal(0, 1e-6, cx.size)
    dy = -1.5 + 2e-4 * cx + 3e-9 * cx * cx
    valid = np.ones(cx.size, bool)
    valid[5] = False
    cxc, cyc = polyfit.fit_shift_models(cx, dx, dy, valid)
    assert abs(cxc[0] - 0.5) < 1e-3 and abs(cxc[1] - 1e-4) < 1e-6
    assert abs(cyc[0] + 1.5) < 1e-3 and abs(cyc[2] - 3e-9) < 1e-12


def test_fused_windowed_crosspower_matches_unfused(rng):
    """The Pallas fused windowed cross-power (interpret mode) matches the
    unfused spectral path."""
    import jax.numpy as jnp

    from opticalimageprocessor_tpu.ops import resample
    from opticalimageprocessor_tpu.ops.phasecorr_pallas import (
        windowed_crosspower_fused,
    )

    band = (rng.random((248, 64)) * 1000).astype(np.float32)
    up = np.asarray(resample.upsample4_f32(jnp.asarray(band)))
    pan = np.roll(np.roll(up, 4, axis=0), -2, axis=1)
    pad = (992, 256)
    far, fai = phasecorr.rfft2_padded(jnp.asarray(pan), pad, True)
    fbr, fbi = phasecorr.upsampled_band_spectrum(jnp.asarray(band))
    want = phasecorr.peak_from_spectra_windowed(far, fai, fbr, fbi, pad, 16, 16)
    fbrs, fbis = phasecorr.band_full_spectrum_small(jnp.asarray(band))
    got = windowed_crosspower_fused(
        far, fai, fbrs, fbis, pad, 248, 16, 16, interpret=True
    )
    assert abs(float(got[0]) - float(want[0])) < 5e-3
    assert abs(float(got[1]) - float(want[1])) < 5e-3
    assert abs(float(got[2]) - float(want[2])) < 5e-3


def test_fused_bands_matches_per_band(rng):
    """The band-batched fused kernel (ONE pallas_call gridded over
    (band, ky-block)) matches four separate single-band calls exactly."""
    import jax.numpy as jnp

    from opticalimageprocessor_tpu.ops import resample
    from opticalimageprocessor_tpu.ops.phasecorr_pallas import (
        windowed_crosspower_fused,
        windowed_crosspower_fused_bands,
    )

    bands = [
        (rng.random((248, 64)) * 1000).astype(np.float32) for _ in range(4)
    ]
    up = np.asarray(resample.upsample4_f32(jnp.asarray(bands[0])))
    pan = np.roll(np.roll(up, 4, axis=0), -2, axis=1)
    pad = (992, 256)
    far, fai = phasecorr.rfft2_padded(jnp.asarray(pan), pad, True)
    fbr4, fbi4 = phasecorr.band_full_spectrum_small(
        jnp.asarray(np.stack(bands))
    )
    dx4, dy4, rs4 = windowed_crosspower_fused_bands(
        far, fai, fbr4, fbi4, pad, 248, 16, 16, interpret=True
    )
    for b in range(4):
        want = windowed_crosspower_fused(
            far, fai, fbr4[b], fbi4[b], pad, 248, 16, 16, interpret=True
        )
        # the batched ky contraction (einsum) reassociates vs the
        # single-band dot: few-ulp drift only
        assert abs(float(dx4[b]) - float(want[0])) < 5e-3, b
        assert abs(float(dy4[b]) - float(want[1])) < 5e-3, b
        assert abs(float(rs4[b]) - float(want[2])) < 5e-3, b
    # and band 0 (a pure shift of the PAN) registers the constructed
    # shift (cv::phaseCorrelate sign convention)
    assert abs(float(dx4[0]) - 2.0) < 0.1
    assert abs(float(dy4[0]) + 4.0) < 0.1
