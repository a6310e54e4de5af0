"""Sharded (multi-chip) pipeline step: sequence parallelism over strip lines.

This is the framework's SPMD execution path: the push-broom line axis is
sharded over a 1-D device mesh, and one jitted step performs

  RRC (local, elementwise)
    -> per-device slice correlation (local batched FFT)
    -> cross-device reduction of shift statistics (psum / all_gather)
    -> on-device polynomial fit (replicated small lstsq)
    -> alignment resample with ppermute halo exchange

mapping the reference's serial sectioning (SURVEY §2 parallelism table) onto
ICI collectives: its sampled sections become per-device samples, its
20000-line alignment batches become device shards, and its 520-line trimmed
overlaps become the halo exchange.

Sharded-mode semantics note: the resample sees true neighbour rows at shard
boundaries (plus border-0 at the strip ends), i.e. the *unsectioned* result.
The reference's per-section border artifacts (the ~2 cubic-support rows at
each 20000-line section seam that read BORDER_CONSTANT zeros,
preproc.h:428-457) are not reproduced here; the host-side
models/preprocessor.py path keeps full sectioned parity.  Everywhere else
the maths is identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..constants import MSS_BANDS
from ..ops.resample import upsample4_f32
from ..ops.rrc import _rrc_math
from .halo import exchange_halo
from .mesh import LINE_AXIS

# conservative static bound on |floor(G)| for the dynamic remap's vertical
# shifts; real band misregistrations are a few pixels
ROW_OFF_BOUND = 6


def remap_band_dynamic(
    band_local: jax.Array,
    coeff_x: jax.Array,
    coeff_y: jax.Array,
    y0,
    axis_name: str | None = None,
):
    """Alignment remap of a local line-shard with traced coefficients.

    ``band_local``: (rows_local, W) uint16; ``y0``: absolute row of local
    row 0 (unused: the fast path's vertical offset is per-column).  When
    ``axis_name`` is given, halo rows come from the neighbouring shards via
    ppermute; otherwise zeros (single-shard strip).

    Fast-path maths (ops.resample.remap_band_fast): horizontal cubic as one
    MXU matmul, vertical as per-column shifted MACs; within 1 DN of the
    parity remap.
    """
    del y0  # vertical offset is per-column in the fast path
    from ..ops.resample import (
        _col_interp_apply,
        _col_interp_matrix,
        _fast_row_pass,
    )

    f32 = jnp.float32
    rows, width = band_local.shape
    coeff_x = jnp.asarray(coeff_x, f32)
    coeff_y = jnp.asarray(coeff_y, f32)
    col_matrix = _col_interp_matrix(coeff_x, width)
    x = jnp.arange(width, dtype=f32)
    xx = x * jnp.float32(MSS_BANDS)
    g = (
        coeff_y[2] * xx * xx + coeff_y[1] * xx + coeff_y[0]
    ) / jnp.float32(MSS_BANDS)

    colg = _col_interp_apply(band_local.astype(f32), col_matrix)
    rb = ROW_OFF_BOUND
    halo_top = rb + 1
    halo_bottom = rb + 2
    if axis_name is not None:
        padded = exchange_halo(colg, halo_top, halo_bottom, axis_name)
    else:
        padded = jnp.pad(colg, ((halo_top, halo_bottom), (0, 0)))

    acc = _fast_row_pass(padded, g, rows, width, rb, halo_top)
    return jnp.clip(jnp.rint(acc), 0.0, 65535.0).astype(jnp.uint16)


def remap_band_dynamic_chunked(
    band: jax.Array,
    coeff_x: jax.Array,
    coeff_y: jax.Array,
    chunk_rows: int,
):
    """Whole-strip dynamic remap, streamed over row chunks with lax.map so
    HBM holds only one chunk's working set (the on-device analogue of the
    reference's SectionaryRemap streaming, imageop.h:230-275 — but with true
    neighbour rows between chunks instead of section borders)."""
    from ..ops.resample import remap_band_fast_chunked

    return remap_band_fast_chunked(
        band, coeff_x, coeff_y, chunk_rows, row_bound=ROW_OFF_BOUND
    )


def _correlate_local(pan_local_f32, band_local_f32, slices: int):
    """Per-device slice correlation: the device's whole local row block is
    one 'section' sample, split into ``slices`` column slices (the
    reference's 5x10 sampling grid, preproc.h:245-259, with sections =
    devices)."""
    from ..ops.phasecorr import _phase_correlate_padded
    from ..ops.cv_exact import get_optimal_dft_size

    h, w = pan_local_f32.shape
    cols = w // slices
    bh, bw = band_local_f32.shape
    bcols = cols // MSS_BANDS

    pan_tiles = jnp.stack(
        [pan_local_f32[:, i * cols : (i + 1) * cols] for i in range(slices)]
    )
    band_tiles = jnp.stack(
        [band_local_f32[:, i * bcols : (i + 1) * bcols] for i in range(slices)]
    )
    up = upsample4_f32(band_tiles)
    pad = (get_optimal_dft_size(h), get_optimal_dft_size(cols))
    dx, dy, rs = jax.vmap(
        lambda a, b: _phase_correlate_padded(a, b, pad)
    )(pan_tiles, up)
    cx = (jnp.arange(slices) * cols + cols // 2).astype(jnp.float32)
    return dx, dy, rs, cx


def _fit_poly(cx, y, deg: int, w=None):
    """Replicated small weighted least-squares (float32 on device)."""
    # normalise x for conditioning
    scale = jnp.float32(1.0 / 4096.0)
    xn = cx * scale
    v = jnp.stack([xn**k for k in range(deg + 1)], axis=-1)
    if w is not None:
        v = v * w[:, None]
        y = y * w
    coeffs, *_ = jnp.linalg.lstsq(v, y)
    return coeffs * jnp.asarray(
        [scale**k for k in range(deg + 1)], coeffs.dtype
    )


def make_align_step(mesh, slices: int = 8, threshold: float = 0.2):
    """Build the jitted multi-chip align step over ``mesh`` (axis 'line').

    Step signature: (pan u16 sharded (L_pan, W_pan), mss u16 sharded
    (4, L_mss, W_band), rrc_pan params (6, W_pan), rrc_mss params
    (4, 6, W_band)) -> (aligned u16 (L_mss, W_band, 4) sharded,
    coeff_x (4, 2), coeff_y (4, 3)).
    """

    def step(pan, mss, pan_params, mss_params):
        def local(pan_l, mss_l, pan_par, mss_par):
            # --- RRC (elementwise, local)
            pan_c = _rrc_math(
                pan_l.astype(jnp.int32), *[pan_par[i][None, :] for i in range(6)]
            ).astype(jnp.uint16)
            mss_c = jnp.stack(
                [
                    _rrc_math(
                        mss_l[b].astype(jnp.int32),
                        *[mss_par[b, i][None, :] for i in range(6)],
                    ).astype(jnp.uint16)
                    for b in range(MSS_BANDS)
                ]
            )

            # --- correlation: this device's rows are one section sample
            panf = pan_c.astype(jnp.float32)
            stats = [
                _correlate_local(panf, mss_c[b].astype(jnp.float32), slices)
                for b in range(MSS_BANDS)
            ]
            # gather all sections' samples: (n_dev, bands, slices)
            dx = jax.lax.all_gather(
                jnp.stack([s[0] for s in stats]), LINE_AXIS
            )
            dy = jax.lax.all_gather(
                jnp.stack([s[1] for s in stats]), LINE_AXIS
            )
            rs = jax.lax.all_gather(
                jnp.stack([s[2] for s in stats]), LINE_AXIS
            )
            cx = stats[0][3]  # same per device

            n_dev = dx.shape[0]
            coeff_x = []
            coeff_y = []
            for b in range(MSS_BANDS):
                bdx = dx[:, b, :].reshape(-1)
                bdy = dy[:, b, :].reshape(-1)
                brs = rs[:, b, :].reshape(-1)
                bcx = jnp.tile(cx, n_dev)
                wgt = (brs >= threshold).astype(jnp.float32)
                cxc = _fit_poly(bcx, bdx, 1, wgt)
                cyc = _fit_poly(bcx, bdy, 2, wgt)
                coeff_x.append(cxc)
                coeff_y.append(cyc)
            coeff_x = jnp.stack(coeff_x)
            coeff_y = jnp.stack(coeff_y)

            # --- alignment remap with halo exchange
            idx = jax.lax.axis_index(LINE_AXIS)
            rows_local = mss_l.shape[1]
            y0 = idx.astype(jnp.int32) * rows_local
            aligned = jnp.stack(
                [
                    remap_band_dynamic(
                        mss_c[b], coeff_x[b], coeff_y[b], y0, LINE_AXIS
                    )
                    for b in range(MSS_BANDS)
                ],
                axis=-1,
            )
            return aligned, coeff_x, coeff_y

        return jax.shard_map(
            local,
            mesh=mesh,
            in_specs=(
                P(LINE_AXIS, None),
                P(None, LINE_AXIS, None),
                P(),
                P(),
            ),
            out_specs=(P(LINE_AXIS, None, None), P(), P()),
            check_vma=False,
        )(pan, mss, pan_params, mss_params)

    return jax.jit(step)
