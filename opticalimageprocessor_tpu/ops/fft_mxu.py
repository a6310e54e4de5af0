"""MXU-native 2-D FFT: DFT as (four-step) matrix multiplication.

XLA:TPU's built-in FFT lowering runs orders of magnitude below hardware
capability (~9 GFLOP/s measured on v5e for the registration tile sizes).
The MXU, however, does 10s-100s of TFLOP/s of matmul — and a DFT *is* a
matmul.  This module implements:

* direct DFT: ``X = x @ F`` with the (n, n) Fourier matrix, for n <= 2048;
* four-step Cooley-Tukey for composite n = n1*n2: column DFTs (matmul),
  twiddle multiply, row DFTs (matmul), transpose — all MXU/VPU ops;
* ``rfft2`` / ``irfft2_real`` built from those, with explicit (re, im)
  float32 pairs (XLA complex matmuls don't hit the MXU reliably).

Although a matmul-DFT spends O(n) more FLOPs than an FFT on the long axis's
factors, the MXU's throughput advantage makes it ~50-100x faster here, and
the four-step split keeps the factor sizes at 128-2048 where the MXU is
saturated.  Numerics: float64-built Fourier/twiddle constants cast to f32,
HIGHEST-precision matmuls; relative error ~1e-6 vs numpy (see tests), far
below the phase-correlation peak's sensitivity.

Used by ops/phasecorr.py for registration (preproc.h:316 / stitcher.h:180
equivalents) whenever the default backend is TPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

_HIGHEST = jax.lax.Precision.HIGHEST

_DIRECT_MAX = 256

# Intermediate dtype for the transform stages.  float32 is the accurate
# default; bfloat16 halves the HBM traffic of these memory-bound stages and
# runs the matmuls natively on the MXU (accumulation stays float32 via
# preferred_element_type).  Registration peaks move by < 2e-3 px (tests).
_STAGE_DTYPE = jnp.float32


def set_stage_dtype(dtype) -> None:
    """Select the transform-stage dtype (jnp.float32 / jnp.bfloat16)."""
    global _STAGE_DTYPE
    _STAGE_DTYPE = dtype


@functools.lru_cache(maxsize=64)
def _dft_consts(n: int, inverse: bool) -> tuple[np.ndarray, np.ndarray]:
    """(cos, sin) of the n-point DFT matrix W[j,k] = exp(s*2pi*i*j*k/n),
    s = +1 for inverse else -1; float64 trig, float32 storage."""
    j = np.arange(n, dtype=np.float64)
    ang = 2.0 * np.pi * np.outer(j, j) / n
    sign = 1.0 if inverse else -1.0
    return (
        np.cos(ang).astype(np.float32),
        (sign * np.sin(ang)).astype(np.float32),
    )


@functools.lru_cache(maxsize=64)
def _twiddle_consts(n1: int, n2: int, inverse: bool):
    """(cos, sin) twiddles W_N^{j2*k1} on the (k1=n1, j2=n2) grid."""
    n = n1 * n2
    k1 = np.arange(n1, dtype=np.float64)[:, None]
    j2 = np.arange(n2, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k1 * j2 / n
    sign = 1.0 if inverse else -1.0
    return (
        np.cos(ang).astype(np.float32),
        (sign * np.sin(ang)).astype(np.float32),
    )


_FACTOR_MAX = 2048   # largest per-factor direct DFT matrix


def _factor(n: int) -> tuple[int, int]:
    """Split composite n into n1*n2 with both factors <= _FACTOR_MAX,
    preferring balance.  Falls back to a direct (n, 1) transform when n is
    small (<= _DIRECT_MAX), has no usable split (primes), or only very
    unbalanced splits (a tiny second factor starves the MXU — a direct
    1228x1228 matmul beats a (307, 4) four-step)."""
    if n <= _DIRECT_MAX:
        return n, 1
    f = int(np.sqrt(n))
    for n1 in range(f, 1, -1):
        if n % n1 == 0:
            n2 = n // n1
            if n1 <= _FACTOR_MAX and n2 <= _FACTOR_MAX:
                if min(n1, n2) < 8 and n <= _FACTOR_MAX:
                    return n, 1
                return (n1, n2) if n1 >= n2 else (n2, n1)
    if n <= _FACTOR_MAX:
        return n, 1
    raise ValueError(f"cannot factor FFT length {n} into MXU-sized factors")


def _mm(a, b):
    dt = _STAGE_DTYPE
    if dt == jnp.float32:
        return jnp.dot(a, b, precision=_HIGHEST)
    return jnp.dot(
        a.astype(dt), b.astype(dt), preferred_element_type=jnp.float32
    )


def _cmatmul(a_re, a_im, c, s):
    """(a_re + i a_im) @ (c + i s) with real MXU matmuls."""
    if a_im is None:
        return _mm(a_re, c), _mm(a_re, s)
    re = _mm(a_re, c) - _mm(a_im, s)
    im = _mm(a_re, s) + _mm(a_im, c)
    return re, im


def _dft_last_axis(x_re, x_im, n: int, inverse: bool, keep: int | None = None):
    """1-D DFT along the last axis of (..., n), four-step when n is large.

    Returns (re, im); no 1/n normalisation (callers handle it).  ``keep``
    truncates the output to the first ``keep`` bins when the direct path is
    taken (halves the matmul + write cost of a real transform's first pass).
    """
    n1, n2 = _factor(n)
    if n2 == 1:
        c, s = (jnp.asarray(v) for v in _dft_consts(n, inverse))
        if keep is not None and keep < n:
            c = c[:, :keep]
            s = s[:, :keep]
        return _cmatmul(x_re, x_im, c, s)

    # four-step: x[(j1, j2)] -> A[k1, j2] = DFT_n1 over j1
    #            B = A * W_N^{j2 k1} -> X[k1, k2] = DFT_n2 over j2
    #            X[k] with k = k1 + n1*k2  ->  transpose (k2, k1)
    batch = x_re.shape[:-1]
    xr = x_re.reshape(*batch, n1, n2)
    xi = x_im.reshape(*batch, n1, n2) if x_im is not None else None

    c1, s1 = (jnp.asarray(v) for v in _dft_consts(n1, inverse))

    def _emm(m, a):
        dt = _STAGE_DTYPE
        if dt == jnp.float32:
            return jnp.einsum("kj,...jn->...kn", m, a, precision=_HIGHEST)
        return jnp.einsum(
            "kj,...jn->...kn", m.astype(dt), a.astype(dt),
            preferred_element_type=jnp.float32,
        )

    # DFT over j1 (axis -2): contract with (n1, n1) matrix on the left
    ar = _emm(c1, xr)
    ai = _emm(s1, xr)
    if xi is not None:
        ar = ar - _emm(s1, xi)
        ai = ai + _emm(c1, xi)

    tc, ts = (jnp.asarray(v) for v in _twiddle_consts(n1, n2, inverse))
    br = ar * tc - ai * ts
    bi = ar * ts + ai * tc

    c2, s2 = (jnp.asarray(v) for v in _dft_consts(n2, inverse))
    xr2, xi2 = _cmatmul(br, bi, c2, s2)   # DFT over j2 (last axis)

    # linear index k = k1 + n1*k2: transpose the (k1, k2) grid to (k2, k1)
    xr2 = jnp.swapaxes(xr2, -1, -2).reshape(*batch, n)
    xi2 = jnp.swapaxes(xi2, -1, -2).reshape(*batch, n)
    return xr2, xi2


def fft2_mxu(x_re, x_im, inverse: bool = False):
    """2-D DFT of (..., H, W) via MXU matmuls.  No normalisation."""
    h, w = x_re.shape[-2], x_re.shape[-1]
    re, im = _dft_last_axis(x_re, x_im, w, inverse)
    re = jnp.swapaxes(re, -1, -2)
    im = jnp.swapaxes(im, -1, -2)
    re, im = _dft_last_axis(re, im, h, inverse)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def rfft2_mxu(x):
    """rfft2 of a real (..., H, W) float32 array -> (re, im) of shape
    (..., H, W//2+1)."""
    h, w = x.shape[-2], x.shape[-1]
    keep = w // 2 + 1
    re, im = _dft_last_axis(x, None, w, inverse=False, keep=keep)
    re = re[..., :keep]
    im = im[..., :keep]
    re = jnp.swapaxes(re, -1, -2)
    im = jnp.swapaxes(im, -1, -2)
    re, im = _dft_last_axis(re, im, h, inverse=False)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def irfft2_real_mxu(re, im, w: int):
    """Real part of the normalised 2-D inverse DFT given the half spectrum
    (..., H, W//2+1); returns (..., H, W) float32.

    Reconstructs the full spectrum by Hermitian symmetry, then runs the
    inverse four-step.  Only the real output is materialised.
    """
    h = re.shape[-2]
    keep = re.shape[-1]
    # Hermitian completion: X[ky, W-kx] = conj(X[(H-ky) mod H, kx]) for the
    # missing columns kx' in [keep, W)
    mid_re = re[..., 1 : w - keep + 1]
    mid_im = im[..., 1 : w - keep + 1]

    def roll_flip(a):  # row map ky -> (H - ky) mod H
        return jnp.roll(jnp.flip(a, -2), 1, axis=-2)

    tail_re = roll_flip(jnp.flip(mid_re, -1))
    tail_im = roll_flip(-jnp.flip(mid_im, -1))
    full_re = jnp.concatenate([re, tail_re], axis=-1)
    full_im = jnp.concatenate([im, tail_im], axis=-1)

    out_re, _ = fft2_mxu(full_re, full_im, inverse=True)
    return out_re / jnp.float32(h * w)
