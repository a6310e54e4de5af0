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


# The transpose-free height transforms (_dft_axis2 / the folded-Hermitian
# irfft) remove 4-6 materialised (H, W)-sized HBM round trips per rfft2 —
# a large share of the registration stage on TPU, where dot_general with a
# permuted output layout is still one deterministic MXU op.  XLA:CPU lowers
# that same contraction through a loop emitter whose reduction partitioning
# (and therefore f32 accumulation order) depends on the host thread/device
# configuration — it changes results across
# --xla_force_host_platform_device_count settings, which would break the
# repo's bitwise route-equality gates on the CPU backend (measured: the stt
# estimate moved 2.5e-6 px between 1- and 8-device configs).  So the
# transpose-free forms are TPU-only; CPU keeps the config-stable
# swapaxes + right-matmul structure.  None = auto (by backend).
_TRANSPOSE_FREE: bool | None = None


def set_transpose_free(v: bool | None) -> None:
    """Force (True/False) or restore auto (None) transpose-free transforms."""
    global _TRANSPOSE_FREE
    _TRANSPOSE_FREE = v


def _transpose_free() -> bool:
    if _TRANSPOSE_FREE is not None:
        return _TRANSPOSE_FREE
    try:
        return jax.default_backend() == "tpu"
    except RuntimeError:
        return False


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


@functools.lru_cache(maxsize=32)
def _dft_consts_packed(n: int, keep: int) -> np.ndarray:
    """[cos | sin] of the forward n-point DFT matrix, truncated to ``keep``
    output bins, packed column-wise into one (n, 2*keep) matrix so a REAL
    input transforms in ONE matmul (one HBM read of the input instead of
    two) on the transpose-free TPU path."""
    c, s = _dft_consts(n, inverse=False)
    return np.concatenate([c[:, :keep], s[:, :keep]], axis=1)


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
    # stays jnp.dot (not an _emm einsum): _mm feeds the CPU-bitwise-gated
    # windowed-peak path, and a dot->einsum relowering could shift f32
    # bits on XLA:CPU (see _TRANSPOSE_FREE)
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
        if x_im is None and not inverse and _transpose_free():
            k = keep if keep is not None and keep < n else n
            cs = jnp.asarray(_dft_consts_packed(n, k))
            out = _mm(x_re, cs)
            return out[..., :k], out[..., k:]
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

    # DFT over j1 (axis -2): contract with (n1, n1) matrix on the left
    p1 = "kj,...jn->...kn"
    ar = _emm(p1, c1, xr)
    ai = _emm(p1, s1, xr)
    if xi is not None:
        ar = ar - _emm(p1, s1, xi)
        ai = ai + _emm(p1, c1, xi)

    tc, ts = (jnp.asarray(v) for v in _twiddle_consts(n1, n2, inverse))
    br = ar * tc - ai * ts
    bi = ar * ts + ai * tc

    c2, s2 = (jnp.asarray(v) for v in _dft_consts(n2, inverse))
    xr2, xi2 = _cmatmul(br, bi, c2, s2)   # DFT over j2 (last axis)

    # linear index k = k1 + n1*k2: transpose the (k1, k2) grid to (k2, k1)
    xr2 = jnp.swapaxes(xr2, -1, -2).reshape(*batch, n)
    xi2 = jnp.swapaxes(xi2, -1, -2).reshape(*batch, n)
    return xr2, xi2


def _emm(pat: str, m, a):
    """einsum in the stage dtype with float32 accumulation — the single
    home of the precision/dtype policy for every DFT contraction."""
    dt = _STAGE_DTYPE
    if dt == jnp.float32:
        return jnp.einsum(pat, m, a, precision=_HIGHEST)
    return jnp.einsum(
        pat, m.astype(dt), a.astype(dt),
        preferred_element_type=jnp.float32,
    )


def _emm_left(m, a):
    """DFT matrix applied on the left of an interior axis (the
    transpose-free form)."""
    return _emm("kj,...jc->...kc", m, a)


def _dft_axis2(x_re, x_im, n: int, inverse: bool):
    """1-D DFT along axis -2 of (..., n, C) by left contractions.

    The transpose-free complement of :func:`_dft_last_axis`: the height
    transform of a row-major (H, W) tile contracts H on the *left* of the
    matmul, so the (H, W)-shaped intermediates never go through
    materialised ``swapaxes`` round trips (each one costs a full
    HBM read+write of both the re and im planes — measured as a large
    share of the registration stage, docs/PERF.md).
    """
    n1, n2 = _factor(n)
    if n2 == 1:
        c, s = (jnp.asarray(v) for v in _dft_consts(n, inverse))
        # (c + i s)^T rows index the output k: out = C @ x (C symmetric)
        re = _emm_left(c, x_re)
        im = _emm_left(s, x_re)
        if x_im is not None:
            re = re - _emm_left(s, x_im)
            im = im + _emm_left(c, x_im)
        return re, im

    # four-step over axis -2: x[(j1*n2 + j2), c] -> (..., n1, n2, c)
    batch = x_re.shape[:-2]
    cdim = x_re.shape[-1]
    xr = x_re.reshape(*batch, n1, n2, cdim)
    xi = x_im.reshape(*batch, n1, n2, cdim) if x_im is not None else None

    c1, s1 = (jnp.asarray(v) for v in _dft_consts(n1, inverse))

    # step 1: DFT over j1 (axis -3)
    p1 = "kj,...jmc->...kmc"
    ar = _emm(p1, c1, xr)
    ai = _emm(p1, s1, xr)
    if xi is not None:
        ar = ar - _emm(p1, s1, xi)
        ai = ai + _emm(p1, c1, xi)

    # step 2: twiddle on the (k1, j2) grid, broadcast over c
    tc, ts = (jnp.asarray(v) for v in _twiddle_consts(n1, n2, inverse))
    tc = tc[..., None]
    ts = ts[..., None]
    br = ar * tc - ai * ts
    bi = ar * ts + ai * tc

    # step 3: DFT over j2 with the (k2, k1) output order baked into the
    # einsum (k = k1 + n1*k2 -> row-major (k2, k1) flatten), no transpose
    c2, s2 = (jnp.asarray(v) for v in _dft_consts(n2, inverse))
    p2 = "lm,...kmc->...lkc"
    re = _emm(p2, c2, br) - _emm(p2, s2, bi)
    im = _emm(p2, c2, bi) + _emm(p2, s2, br)
    return (
        re.reshape(*batch, n, cdim),
        im.reshape(*batch, n, cdim),
    )


def fft2_mxu(x_re, x_im, inverse: bool = False):
    """2-D DFT of (..., H, W) via MXU matmuls.  No normalisation."""
    h, w = x_re.shape[-2], x_re.shape[-1]
    re, im = _dft_last_axis(x_re, x_im, w, inverse)
    if _transpose_free():
        return _dft_axis2(re, im, h, inverse)
    re = jnp.swapaxes(re, -1, -2)
    im = jnp.swapaxes(im, -1, -2)
    re, im = _dft_last_axis(re, im, h, inverse)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


def rfft2_mxu(x):
    """rfft2 of a real (..., H, W) float32 array -> (re, im) of shape
    (..., H, W//2+1).

    Width pass: direct/four-step DFT along the last axis, truncated to the
    half spectrum.  Height pass on TPU: left-contraction DFT along axis -2
    (:func:`_dft_axis2`) — no materialised transposes anywhere; on CPU the
    config-stable swapaxes form (see ``_TRANSPOSE_FREE``).
    """
    h, w = x.shape[-2], x.shape[-1]
    keep = w // 2 + 1
    re, im = _dft_last_axis(x, None, w, inverse=False, keep=keep)
    re = re[..., :keep]
    im = im[..., :keep]
    if _transpose_free():
        return _dft_axis2(re, im, h, inverse=False)
    re = jnp.swapaxes(re, -1, -2)
    im = jnp.swapaxes(im, -1, -2)
    re, im = _dft_last_axis(re, im, h, inverse=False)
    return jnp.swapaxes(re, -1, -2), jnp.swapaxes(im, -1, -2)


@functools.lru_cache(maxsize=32)
def _irfft_real_consts(w: int) -> tuple[np.ndarray, np.ndarray]:
    """(keep, w) matrices folding Hermitian symmetry into the real-output
    inverse transform: x[c] = sum_k a_k (Re X_k cos - Im X_k sin)(2pi k c/w)
    with a_0 = a_{w/2} = 1 (w even) and a_k = 2 otherwise."""
    keep = w // 2 + 1
    k = np.arange(keep, dtype=np.float64)[:, None]
    c = np.arange(w, dtype=np.float64)[None, :]
    ang = 2.0 * np.pi * k * c / w
    alpha = np.full((keep, 1), 2.0)
    alpha[0, 0] = 1.0
    if w % 2 == 0:
        alpha[-1, 0] = 1.0
    return (
        (alpha * np.cos(ang)).astype(np.float32),
        (alpha * np.sin(ang)).astype(np.float32),
    )


def irfft2_real_mxu(re, im, w: int):
    """Real part of the normalised 2-D inverse DFT given the half spectrum
    (..., H, W//2+1); returns (..., H, W) float32.

    On TPU the height inverse runs on the half spectrum (left
    contractions, no transposes) and the width inverse folds the Hermitian
    symmetry into a single (keep, W) real-output matmul pair — the
    full-width complex spectrum is never materialised.  CPU (and widths
    with no MXU-sized direct matrix) take the config-stable explicit
    Hermitian completion + full inverse.
    """
    h = re.shape[-2]
    keep = re.shape[-1]
    if w > _FACTOR_MAX or not _transpose_free():
        # CPU (config-stable) path and rare huge-width fallback:
        # complete the spectrum, full inverse
        mid_re = re[..., 1 : w - keep + 1]
        mid_im = im[..., 1 : w - keep + 1]

        def roll_flip(a):  # row map ky -> (H - ky) mod H
            return jnp.roll(jnp.flip(a, -2), 1, axis=-2)

        full_re = jnp.concatenate(
            [re, roll_flip(jnp.flip(mid_re, -1))], axis=-1
        )
        full_im = jnp.concatenate(
            [im, roll_flip(-jnp.flip(mid_im, -1))], axis=-1
        )
        out_re, _ = fft2_mxu(full_re, full_im, inverse=True)
        return out_re / jnp.float32(h * w)

    hr, hi = _dft_axis2(re, im, h, inverse=True)
    cr, sr = (jnp.asarray(v) for v in _irfft_real_consts(w))
    out = _mm(hr, cr) - _mm(hi, sr)
    return out / jnp.float32(h * w)
