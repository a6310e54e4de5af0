"""Fused Pallas kernel for the windowed cross-power evaluation.

The fast registration path's per-band cost is dominated by HBM traffic:
building the tiled upsampled-band spectrum, normalising the cross-power,
and feeding the window-evaluation matmul each stream the full (M, keep)
spectrum through HBM several times.  This kernel fuses all of it:

  per ky-block (VMEM-resident):
    F_up = (Hr x Hc) * tile(F_band)          # spectral upsample
    C    = F_pan * conj(F_up)                # cross-power
    Cn   = C / |C|                           # whitening
    D   += Cn @ E_x                          # kx -> window columns

so the PAN spectrum is read once and only the small (M, Wx) partial result
is written back.  The final ky -> window-rows contraction is a tiny matmul
done by the caller (ops/phasecorr.peak_from_spectra_windowed does the same
two-stage evaluation unfused).

Status: numerically verified against the unfused path (tests + TPU) and
wired into models/device_pipeline.register_fast on TPU.  Measured on v5e at
the default registration shapes (80 band-tiles of 4000x307 vs 16000x1228
PAN tiles): the unfused spectral path spends ~50 ms materialising the
tiled upsampled spectra; this kernel makes the whole band side ~free
(within dispatch noise), ~4x faster end-to-end registration.

Requirements: M = factor * m (the PAN tile height is an exact multiple of
the band tile height — true by construction: 16000 = 4 x 4000), and the
ky-block size divides m so each block maps to one contiguous F_band row
block (no gathers).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def windowed_crosspower_fused(
    fpr, fpi,                 # (M, keep) f32 PAN half spectrum
    fbr_full, fbi_full,       # (m_small, n_small) f32 full band spectrum
    pad_to: tuple[int, int],
    m_small: int,
    win_y: int = 64,
    win_x: int = 64,
    interpret: bool = False,
):
    """Fused windowed correlation peak vs a spectrally-upsampled band.

    Returns (dx, dy, response) with the same semantics as
    ops/phasecorr.peak_from_spectra_windowed fed by
    ops/phasecorr.upsampled_band_spectrum.  Thin wrapper over the
    band-batched kernel with bands=1 (one source of truth for the math).
    """
    dx, dy, rs = windowed_crosspower_fused_bands(
        fpr, fpi, fbr_full[None], fbi_full[None], pad_to, m_small,
        win_y, win_x, interpret,
    )
    return dx[0], dy[0], rs[0]


def _kernel_tiles(
    fpr_ref, fpi_ref,          # (1, B, keep): this tile's PAN block
    fbr_ref, fbi_ref,          # (1, 1, B, n_small): this (tile, band)'s rows
    hr_re_ref, hr_im_ref,      # (B, 1)
    hc_re_ref, hc_im_ref,      # (1, keep)
    exc_ref, exs_ref,          # (keep, wx)
    dr_ref, di_ref,            # (1, 1, B, wx) out
    *, keep: int, n_small: int,
):
    fbr = fbr_ref[0, 0]
    fbi = fbi_ref[0, 0]
    reps = -(-keep // n_small)
    fbr_t = jnp.concatenate([fbr] * (reps + 1), axis=1)[:, :keep]
    fbi_t = jnp.concatenate([fbi] * (reps + 1), axis=1)[:, :keep]

    hr_re = hr_re_ref[:]
    hr_im = hr_im_ref[:]
    hc_re = hc_re_ref[:]
    hc_im = hc_im_ref[:]
    h_re = hr_re * hc_re - hr_im * hc_im
    h_im = hr_re * hc_im + hr_im * hc_re
    fur = h_re * fbr_t - h_im * fbi_t
    fui = h_re * fbi_t + h_im * fbr_t

    fpr = fpr_ref[0]
    fpi = fpi_ref[0]
    cr = fpr * fur + fpi * fui
    ci = fpi * fur - fpr * fui
    mag = jnp.sqrt(cr * cr + ci * ci)
    den = jnp.where(mag == 0, jnp.float32(1.0), mag)
    cnr = (cr / den).astype(jnp.bfloat16)
    cni = (ci / den).astype(jnp.bfloat16)

    exc = exc_ref[:].astype(jnp.bfloat16)
    exs = exs_ref[:].astype(jnp.bfloat16)
    dr_ref[0, 0] = jnp.dot(
        cnr, exc, preferred_element_type=jnp.float32
    ) - jnp.dot(cni, exs, preferred_element_type=jnp.float32)
    di_ref[0, 0] = jnp.dot(
        cni, exc, preferred_element_type=jnp.float32
    ) + jnp.dot(cnr, exs, preferred_element_type=jnp.float32)


def windowed_crosspower_fused_bands(
    fpr, fpi,                 # (M, keep) f32 PAN half spectrum (shared)
    fbr_full, fbi_full,       # (bands, m_small, n_small) f32 band spectra
    pad_to: tuple[int, int],
    m_small: int,
    win_y: int = 64,
    win_x: int = 64,
    interpret: bool = False,
):
    """Band-batched :func:`windowed_crosspower_fused`: ONE pallas_call
    evaluates all ``bands`` windowed cross-power surfaces against the
    shared PAN spectrum.  Thin wrapper over the tile-batched kernel with
    tiles=1 (one source of truth for the math).

    Returns (dx, dy, response) each shaped (bands,).
    """
    dx, dy, rs = windowed_crosspower_fused_tiles(
        fpr[None], fpi[None], fbr_full[None], fbi_full[None], pad_to,
        m_small, win_y, win_x, interpret,
    )
    return dx[0], dy[0], rs[0]


@functools.partial(
    jax.jit,
    static_argnames=("pad_to", "m_small", "win_y", "win_x", "interpret"),
)
def windowed_crosspower_fused_tiles(
    fpr, fpi,                 # (tiles, M, keep) f32 PAN half spectra
    fbr_full, fbi_full,       # (tiles, bands, m_small, n_small) f32 spectra
    pad_to: tuple[int, int],
    m_small: int,
    win_y: int = 64,
    win_x: int = 64,
    interpret: bool = False,
):
    """Tile-and-band-batched fused windowed cross-power: ONE pallas_call
    with grid (tiles, bands, ky-blocks) evaluates every (tile, band)
    windowed correlation surface — e.g. a whole registration section's
    slices x bands grid in a single kernel launch, instead of a
    lax.map step per tile (the per-step dispatch/extraction overhead was
    the register stage's largest unexplained cost — docs/PERF.md).

    Returns (dx, dy, response) each shaped (tiles, bands).
    """
    from .phasecorr import _eval_consts, _upsample_filter_response

    M, N = pad_to
    keep = fpr.shape[-1]
    tiles, bands, _, n_small = fbr_full.shape
    factor = M // m_small
    assert factor * m_small == M

    # ky-block height: largest 8-multiple divisor of m_small whose per-step
    # VMEM footprint fits.  The dominant VMEM terms scale with
    # blk * (keep + n_small) (double-buffered input blocks + the ~6 live
    # (blk, keep) temps inside the kernel); the budget constant is
    # calibrated on hardware: blk=400 at the default registration shape
    # (keep=615, n_small=308) compiles with headroom, while blk=400 at the
    # slices=5 shape (keep=1229) exceeded the 16 MB scoped-VMEM limit by
    # 2.5 MB (measured v5e failure) — so cap blk * (keep + n_small) at the
    # known-good product and the wide-tile configs land on blk<=200.
    vmem_cap = 400 * (615 + 308)
    blk = max(
        (
            d for d in range(8, 513, 8)
            if m_small % d == 0 and d * (keep + n_small) <= vmem_cap
        ),
        default=None,
    )
    if blk is None:
        blk = min(
            (d for d in range(8, 513, 8) if m_small % d == 0), default=None
        )
    if blk is None:
        raise ValueError(f"band tile height {m_small} not 8-divisible")
    n_blocks = M // blk
    fb_blocks_mod = m_small // blk

    hr_re, hr_im = (
        np.asarray(v) for v in _upsample_filter_response(m_small, factor)
    )
    hc_re, hc_im = (
        np.asarray(v) for v in _upsample_filter_response(n_small, factor)
    )
    hr_re = jnp.asarray(hr_re.reshape(M, 1))
    hr_im = jnp.asarray(hr_im.reshape(M, 1))
    hc_re = jnp.asarray(hc_re[:keep].reshape(1, keep))
    hc_im = jnp.asarray(hc_im[:keep].reshape(1, keep))

    exc, exs = (jnp.asarray(v) for v in _eval_consts(N, keep, win_x, False))
    wx = 2 * win_x + 1

    kernel = functools.partial(_kernel_tiles, keep=keep, n_small=n_small)
    dr, di = pl.pallas_call(
        kernel,
        grid=(tiles, bands, n_blocks),
        in_specs=[
            pl.BlockSpec(
                (1, blk, keep), lambda t, b, i: (t, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, blk, keep), lambda t, b, i: (t, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, blk, n_small),
                lambda t, b, i, fbm=fb_blocks_mod: (
                    t, b, jax.lax.rem(i, jnp.int32(fbm)), 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, blk, n_small),
                lambda t, b, i, fbm=fb_blocks_mod: (
                    t, b, jax.lax.rem(i, jnp.int32(fbm)), 0
                ),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (blk, 1), lambda t, b, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (blk, 1), lambda t, b, i: (i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, keep), lambda t, b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (1, keep), lambda t, b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (keep, wx), lambda t, b, i: (0, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (keep, wx), lambda t, b, i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=(
            pl.BlockSpec(
                (1, 1, blk, wx), lambda t, b, i: (t, b, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, 1, blk, wx), lambda t, b, i: (t, b, i, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tiles, bands, M, wx), jnp.float32),
            jax.ShapeDtypeStruct((tiles, bands, M, wx), jnp.float32),
        ),
        interpret=interpret,
    )(fpr, fpi, fbr_full, fbi_full, hr_re, hr_im, hc_re, hc_im, exc, exs)

    # ky -> window rows per (tile, band) (batched tiny matmuls) + centroids
    cy_c, cy_s = (jnp.asarray(v) for v in _eval_consts(M, M, win_y, True))
    corr = (
        jnp.einsum(
            "km,tbkw->tbmw", cy_c, dr, precision=jax.lax.Precision.HIGHEST
        )
        - jnp.einsum(
            "km,tbkw->tbmw", cy_s, di, precision=jax.lax.Precision.HIGHEST
        )
    ) / jnp.float32(M * N)

    from .phasecorr import _centroid_on_window

    cen = jax.vmap(jax.vmap(_centroid_on_window, (0, None, None)), (0, None, None))
    return cen(corr, win_y, win_x)
