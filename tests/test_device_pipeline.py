"""Fused device pipeline: registration accuracy, response filtering, stt
estimation, and end-to-end shapes."""

import jax.numpy as jnp
import numpy as np
import pytest

from opticalimageprocessor_tpu.models.device_pipeline import (
    check_registration_valid,
    check_stt_valid,
    make_device_pipeline,
    register_fast,
    stt_estimate_fast,
)
from opticalimageprocessor_tpu.ops import resample, rrc


def _scene_pair(rng, lines_mss, band_px):
    scene = rng.integers(2000, 42000, (lines_mss, band_px)).astype(np.uint16)
    pan = np.clip(
        np.rint(np.asarray(resample.upsample4_f32(scene.astype(np.float32)))),
        0,
        65535,
    ).astype(np.uint16)
    return scene, pan


def test_register_fast_recovers_shifts(rng):
    """register_fast finds the constructed per-band shifts (PAN = upsampled
    scene, bands = rolled scene -> measured shift = 4x the band roll)."""
    lines_mss, band_px = 512, 3072 // 4  # full width so slices divide evenly
    scene, pan = _scene_pair(rng, lines_mss, band_px)
    vy = [0, -1, 1, 0]
    vx = [1, 0, -1, 2]
    mss = np.stack(
        [np.roll(np.roll(scene, vy[b], 0), vx[b], 1) for b in range(4)]
    )
    coeffs, n_valid = register_fast(
        jnp.asarray(pan), jnp.asarray(mss), slices=8, n_sections=1,
        win=(16, 16),
    )
    check_registration_valid(n_valid)
    for b in range(4):
        cx, cy = np.asarray(coeffs[b][0]), np.asarray(coeffs[b][1])
        # constant shifts: c0 ~= 4*v, slope ~= 0
        assert abs(cx[0] - 4 * vx[b]) < 0.3, (b, cx)
        assert abs(cy[0] - 4 * vy[b]) < 0.3, (b, cy)


def test_register_fast_excludes_low_response(rng):
    """Flat (zero-texture) tiles fall below the 0.4 response threshold and
    are provably excluded from the fit; all-flat bands trip the reference's
    min-count error (preproc.h:505-510)."""
    lines_mss, band_px = 512, 3072 // 4
    scene, pan = _scene_pair(rng, lines_mss, band_px)
    mss = np.stack([np.roll(scene, 1, 1) for _ in range(4)])

    # flatten slices 0-2 of band 0 in BOTH sensors (cloud/water analogue):
    # their response collapses, the rest stay valid
    cols = band_px // 8
    mss_flat = mss.copy()
    mss_flat[0, :, : 3 * cols] = 9000
    pan_flat = pan.copy()
    pan_flat[:, : 3 * cols * 4] = 9000
    coeffs_all, valid_all = register_fast(
        jnp.asarray(pan), jnp.asarray(mss), slices=8, n_sections=1,
        win=(16, 16),
    )
    coeffs_fl, valid_fl = register_fast(
        jnp.asarray(pan_flat), jnp.asarray(mss_flat), slices=8, n_sections=1,
        win=(16, 16),
    )
    valid_all = np.asarray(valid_all)
    valid_fl = np.asarray(valid_fl)
    assert valid_all[0] == 8
    assert valid_fl[0] == valid_all[0] - 3   # the 3 flat slices dropped out
    check_registration_valid(valid_fl)       # 5 remain: still fittable
    # the surviving fit still recovers the constructed shift
    cx0 = np.asarray(coeffs_fl[0][0])
    assert abs(cx0[0] - 4.0) < 0.5, cx0

    # fully flat scene -> 0 valid -> reference error
    flat_pan = np.full_like(pan, 9000)
    flat_mss = np.full_like(mss, 9000)
    _, valid_none = register_fast(
        jnp.asarray(flat_pan), jnp.asarray(flat_mss), slices=8, n_sections=1,
        win=(16, 16),
    )
    with pytest.raises(RuntimeError, match="Not enough valid correlation"):
        check_registration_valid(valid_none)


def test_stt_estimate_fast_recovers_overlap_shift(rng):
    """stt_estimate_fast recovers the constructed CMOS overlap translation
    (CalcSttParameters analogue)."""
    lines, width = 1024, 1024
    ov = 200
    wide = rng.integers(2000, 42000, (lines + 8, 2 * width)).astype(np.uint16)
    pan1 = np.ascontiguousarray(wide[4 : 4 + lines, :width])
    pan2 = np.ascontiguousarray(
        wide[2 : 2 + lines, width - ov + 3 : 2 * width - ov + 3]
    )
    dx, dy, resp, n = stt_estimate_fast(
        jnp.asarray(pan1), jnp.asarray(pan2), sections=4,
        overlap_cols=ov,
    )
    check_stt_valid(n)
    assert int(n) == 4
    # pan2's left block = roll(pan1's right block, rows +2, cols -3)
    assert abs(float(dx) - (-3.0)) < 0.2, float(dx)
    assert abs(float(dy) - 2.0) < 0.2, float(dy)

    # non-overlapping noise -> no valid deltas -> reference error
    p3 = rng.integers(2000, 42000, (lines, width)).astype(np.uint16)
    _, _, _, n0 = stt_estimate_fast(
        jnp.asarray(pan1), jnp.asarray(p3), sections=4, overlap_cols=ov
    )
    with pytest.raises(RuntimeError, match="No valid delta value"):
        check_stt_valid(n0)


def test_device_pipeline_shapes(rng):
    from opticalimageprocessor_tpu.constants import PIXELS_PER_LINE

    lines_pan = 2048
    lines_mss = lines_pan // 4
    scene = rng.integers(2000, 42000, (lines_mss, 3072)).astype(np.uint16)
    pan1_h = np.clip(
        np.rint(np.asarray(resample.upsample4_f32(scene.astype(np.float32)))),
        0, 65535,
    ).astype(np.uint16)
    # PAN2's left 200 cols = PAN1's right-edge ground, small offset
    pan2_h = np.roll(
        np.roll(pan1_h, 2, axis=0), 200 - 3 - PIXELS_PER_LINE, axis=1
    )
    mss = jnp.asarray(
        np.stack(
            [
                np.roll(np.roll(scene, b % 2, axis=0), b - 1, axis=1)
                for b in range(4)
            ]
        )
    )
    pp = jnp.asarray(
        rrc.split_rrc_params(np.ones(PIXELS_PER_LINE), np.zeros(PIXELS_PER_LINE))
    )
    mp = jnp.asarray(
        np.stack([rrc.split_rrc_params(np.ones(3072), np.zeros(3072))] * 4)
    )
    pipeline = make_device_pipeline(slices=8, fold=200, stt_sections=4)
    aligned, stitched, n_valid, n_stt = pipeline(
        jnp.asarray(pan1_h), jnp.asarray(pan2_h), mss, pp, pp, mp
    )
    assert aligned.shape == (lines_mss, 3072, 4)
    assert stitched.shape == (lines_pan, 2 * (PIXELS_PER_LINE - 200))
    assert aligned.dtype == jnp.uint16 and stitched.dtype == jnp.uint16
    check_registration_valid(n_valid)
    check_stt_valid(n_stt)
    # stitch left half is PAN1's RRC'd left columns verbatim (identity RRC)
    np.testing.assert_array_equal(
        np.asarray(stitched[:, : PIXELS_PER_LINE - 200]),
        pan1_h[:, : PIXELS_PER_LINE - 200],
    )


def test_pipeline_odd_strip_lengths(rng):
    """Arbitrary (prime-ish) strip lengths must not break the fast path's
    MXU DFT factorisation (stt window heights are rounded to x64)."""
    import jax
    import jax.numpy as jnp

    from opticalimageprocessor_tpu.models import device_pipeline as dp
    from opticalimageprocessor_tpu.ops import rrc

    lines_pan, width = 1310, 640   # lines//10 = 131 (prime)
    pan1 = jnp.asarray(
        rng.integers(0, 65536, (lines_pan, width), dtype=np.uint16)
    )
    pan2 = jnp.roll(pan1, 3, axis=1)
    mss = jnp.asarray(
        rng.integers(
            0, 65536, (4, lines_pan // 4, width // 4), dtype=np.uint16
        )
    )
    params = jnp.asarray(
        rrc.split_rrc_params(np.ones(width), np.zeros(width))
    )
    bparams = jnp.asarray(
        np.stack(
            [rrc.split_rrc_params(np.ones(width // 4), np.zeros(width // 4))]
            * 4
        )
    )
    pipe = dp.make_device_pipeline(
        slices=8, stt_sections=2, overlap_cols=32, fold=32
    )
    aligned, stitched, n_valid, n_stt = jax.jit(pipe)(
        pan1, pan2, mss, params, params, bparams
    )
    assert aligned.shape == (lines_pan // 4, width // 4, 4)
    assert stitched.shape == (lines_pan, 2 * (width - 32))


def test_stt_sections_exceed_strip_raises(rng):
    """Reference parity: too many stt sections for the strip is the host
    Stitcher ctor's error, not silently clamped duplicate windows."""
    import jax.numpy as jnp
    import pytest

    from opticalimageprocessor_tpu.models import device_pipeline as dp

    pan = jnp.asarray(rng.integers(0, 65536, (512, 640), dtype=np.uint16))
    with pytest.raises(ValueError, match="less than sections times"):
        dp.stt_estimate_fast(pan, pan, sections=10, overlap_cols=32)
