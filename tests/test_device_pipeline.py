"""Fused device pipeline: registration accuracy and end-to-end shapes."""

import jax.numpy as jnp
import numpy as np

from opticalimageprocessor_tpu.models.device_pipeline import (
    make_device_pipeline,
    register_fast,
)
from opticalimageprocessor_tpu.ops import resample, rrc


def test_register_fast_recovers_shifts(rng):
    """register_fast finds the constructed per-band shifts (PAN = upsampled
    scene, bands = rolled scene -> measured shift = 4x the band roll)."""
    lines_mss, band_px = 512, 3072 // 4  # full width so slices divide evenly
    scene = rng.integers(2000, 42000, (lines_mss, band_px)).astype(np.uint16)
    pan = np.clip(
        np.rint(np.asarray(resample.upsample4_f32(scene.astype(np.float32)))),
        0,
        65535,
    ).astype(np.uint16)
    vy = [0, -1, 1, 0]
    vx = [1, 0, -1, 2]
    mss = np.stack(
        [np.roll(np.roll(scene, vy[b], 0), vx[b], 1) for b in range(4)]
    )
    coeffs = register_fast(
        jnp.asarray(pan), jnp.asarray(mss), slices=8, n_sections=1,
        win=(16, 16),
    )
    for b in range(4):
        cx, cy = np.asarray(coeffs[b][0]), np.asarray(coeffs[b][1])
        # constant shifts: c0 ~= 4*v, slope ~= 0
        assert abs(cx[0] - 4 * vx[b]) < 0.3, (b, cx)
        assert abs(cy[0] - 4 * vy[b]) < 0.3, (b, cy)


def test_device_pipeline_shapes(rng):
    from opticalimageprocessor_tpu.constants import PIXELS_PER_LINE

    lines_pan = 2048
    lines_mss = lines_pan // 4
    pan = jnp.asarray(
        rng.integers(0, 65536, (lines_pan, PIXELS_PER_LINE), dtype=np.uint16)
    )
    mss = jnp.asarray(
        rng.integers(0, 65536, (4, lines_mss, 3072), dtype=np.uint16)
    )
    pp = jnp.asarray(
        rrc.split_rrc_params(np.ones(PIXELS_PER_LINE), np.zeros(PIXELS_PER_LINE))
    )
    mp = jnp.asarray(
        np.stack([rrc.split_rrc_params(np.ones(3072), np.zeros(3072))] * 4)
    )
    pipeline = make_device_pipeline(slices=8, fold=200)
    aligned, stitched = pipeline(pan, mss, pp, mp)
    assert aligned.shape == (lines_mss, 3072, 4)
    assert stitched.shape == (lines_pan, 2 * (PIXELS_PER_LINE - 200))
    assert aligned.dtype == jnp.uint16 and stitched.dtype == jnp.uint16
