"""Phase-correlation shift estimation on TPU (XLA FFT).

Implements ``cv::phaseCorrelate`` semantics (OpenCV phasecorr.cpp), used by
the reference at two call sites:

* PAN slice vs 4x-upsampled MSS band slice (preproc.h:316)
* PAN1 right-edge strip vs PAN2 left-edge strip (stitcher.h:180)

Semantics reproduced exactly (float32):
  1. zero-pad each tile to the optimal DFT size (2^a 3^b 5^c),
  2. cross-power spectrum C = F1 * conj(F2) / |F1 * conj(F2)| (no window —
     the reference passes cv::noArray()),
  3. inverse FFT, fftshift,
  4. arg-max peak (row-major first-match, like cv::minMaxLoc),
  5. 5x5 weighted centroid around the peak (edge-clipped), response = window
     sum (OpenCV's unnormalised idft sum divided by M*N equals the normalised
     ifft sum directly),
  6. shift = (pad_center - centroid).

TPU-first design: the whole routine is jit-compatible with static tile
shapes, and `phase_correlate_batch` vmaps it over a leading tile axis so the
200 tile-correlations of a default registration run execute as one batched
FFT on the device (the reference loops them serially through OpenCV,
preproc.h:251-327).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from .cv_exact import get_optimal_dft_size


@functools.partial(jax.jit, static_argnames=("pad_to",))
def _phase_correlate_padded(a: jax.Array, b: jax.Array, pad_to: tuple[int, int]):
    """Core routine on already-shaped f32 tiles; returns (dx, dy, response)."""
    h, w = a.shape[-2], a.shape[-1]
    M, N = pad_to

    def one(x):
        return jnp.pad(x, ((0, M - h), (0, N - w)))

    pa = one(a)
    pb = one(b)
    fa = jnp.fft.rfft2(pa)
    fb = jnp.fft.rfft2(pb)
    p = fa * jnp.conj(fb)
    mag = jnp.abs(p)
    c = jnp.where(mag != 0, p / jnp.where(mag == 0, 1.0, mag), 0.0)
    corr = jnp.fft.irfft2(c, s=(M, N))
    corr = jnp.fft.fftshift(corr)

    peak = jnp.argmax(corr)          # row-major first max, like minMaxLoc
    py = peak // N
    px = peak % N

    # 5x5 centroid window, clipped at the edges exactly like weightedCentroid
    minr = jnp.maximum(py - 2, 0)
    maxr = jnp.minimum(py + 2, M - 1)
    minc = jnp.maximum(px - 2, 0)
    maxc = jnp.minimum(px + 2, N - 1)
    # gather a static 5x5 window anchored at minr/minc then mask rows/cols
    # beyond maxr/maxc (anchor is already clipped >= 0; when the peak sits at
    # the far edge the window start also needs clipping so the slice stays
    # in-bounds)
    start_r = jnp.minimum(minr, M - 5)
    start_c = jnp.minimum(minc, N - 5)
    win = jax.lax.dynamic_slice(corr, (start_r, start_c), (5, 5))
    rr = start_r + jnp.arange(5)[:, None]
    cc = start_c + jnp.arange(5)[None, :]
    valid = (rr >= minr) & (rr <= maxr) & (cc >= minc) & (cc <= maxc)
    winm = jnp.where(valid, win, 0.0)

    s = jnp.sum(winm)
    response = s
    s_eps = s + jnp.asarray(np.float32(np.finfo(np.float64).eps), winm.dtype)
    cx = jnp.sum(winm * cc.astype(winm.dtype)) / s_eps
    cy = jnp.sum(winm * rr.astype(winm.dtype)) / s_eps
    dx = N / 2.0 - cx
    dy = M / 2.0 - cy
    return dx, dy, response


def phase_correlate(a, b) -> tuple[float, float, float]:
    """Single-pair correlation; returns python floats (dx, dy, response)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    M = get_optimal_dft_size(a.shape[0])
    N = get_optimal_dft_size(a.shape[1])
    dx, dy, r = _phase_correlate_padded(a, b, (M, N))
    return float(dx), float(dy), float(r)


@functools.partial(jax.jit, static_argnames=("pad_to",))
def _phase_correlate_batch_padded(a, b, pad_to):
    return jax.vmap(lambda x, y: _phase_correlate_padded(x, y, pad_to))(a, b)


def phase_correlate_batch(a, b):
    """Batched correlation over a leading axis: (T, H, W) x (T, H, W) →
    (dx[T], dy[T], response[T]) as jnp arrays — one fused batched FFT."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    M = get_optimal_dft_size(a.shape[1])
    N = get_optimal_dft_size(a.shape[2])
    return _phase_correlate_batch_padded(a, b, (M, N))
