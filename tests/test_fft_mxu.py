"""MXU DFT (four-step matmul transforms) vs numpy FFT."""

import jax.numpy as jnp
import numpy as np
import pytest

from opticalimageprocessor_tpu.ops import fft_mxu


@pytest.fixture(params=[False, True], ids=["swapaxes", "transpose-free"])
def tfree(request):
    """Run both height-transform structures (the TPU transpose-free form
    and the CPU config-stable swapaxes form) on the CPU test backend."""
    fft_mxu.set_transpose_free(request.param)
    yield request.param
    fft_mxu.set_transpose_free(None)


@pytest.mark.parametrize(
    "shape", [(64, 50), (128, 128), (250, 96), (500, 250), (1600, 128)]
)
def test_rfft2_matches_numpy(shape, rng, tfree):
    x = (rng.random(shape) * 100).astype(np.float32)
    re, im = fft_mxu.rfft2_mxu(jnp.asarray(x))
    want = np.fft.rfft2(x)
    scale = np.abs(want).max()
    np.testing.assert_allclose(np.asarray(re), want.real, atol=2e-6 * scale)
    np.testing.assert_allclose(np.asarray(im), want.imag, atol=2e-6 * scale)


@pytest.mark.parametrize(
    "shape",
    [
        (64, 50),
        (250, 96),
        (320, 250),
        (64, 51),     # odd width: no Nyquist bin in the alpha weights
        (50, 2500),   # width > _FACTOR_MAX: Hermitian-completion fallback
    ],
)
def test_irfft2_roundtrip(shape, rng, tfree):
    x = (rng.random(shape) * 100).astype(np.float32)
    f = np.fft.rfft2(x)
    back = fft_mxu.irfft2_real_mxu(
        jnp.asarray(f.real.astype(np.float32)),
        jnp.asarray(f.imag.astype(np.float32)),
        shape[1],
    )
    np.testing.assert_allclose(np.asarray(back), x, atol=2e-3)


def test_fft2_inverse_identity(rng, tfree):
    x = (rng.random((96, 80)) * 10).astype(np.float32)
    re, im = fft_mxu.fft2_mxu(jnp.asarray(x), None, inverse=False)
    back_re, back_im = fft_mxu.fft2_mxu(re, im, inverse=True)
    np.testing.assert_allclose(
        np.asarray(back_re) / (96 * 80), x, atol=1e-4
    )
    np.testing.assert_allclose(np.asarray(back_im) / (96 * 80), 0, atol=1e-4)


def test_factor():
    assert fft_mxu._factor(128) == (128, 1)
    n1, n2 = fft_mxu._factor(16000)
    assert n1 * n2 == 16000 and max(n1, n2) <= fft_mxu._DIRECT_MAX
    n1, n2 = fft_mxu._factor(1250)
    assert n1 * n2 == 1250 and max(n1, n2) <= fft_mxu._DIRECT_MAX
    with pytest.raises(ValueError):
        fft_mxu._factor(99991 * 7)  # large prime-ish, unfactorable


def test_bf16_stage_accuracy(rng):
    """bf16 stages stay within ~1e-2 relative of the f32 transforms (used
    only in fast mode; peak movement measured < 2e-3 px)."""
    x = (rng.random((320, 250)) * 1000).astype(np.float32)
    re32, im32 = fft_mxu.rfft2_mxu(jnp.asarray(x))
    try:
        fft_mxu.set_stage_dtype(jnp.bfloat16)
        re16, im16 = fft_mxu.rfft2_mxu(jnp.asarray(x))
    finally:
        fft_mxu.set_stage_dtype(jnp.float32)
    scale = float(jnp.abs(re32).max())
    assert float(jnp.abs(re16 - re32).max()) < 2e-2 * scale
