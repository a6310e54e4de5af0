"""Same-process ablation timing for the fast remap stages.

Attributes the flagship pipeline's resample costs (PERF.md "Where the
time goes"): the 4-band alignment remap (~30 ms at 32768 lines) and the
fused stitch tail (~27 ms) sit 10-25x above HBM speed-of-light, so this
times each piece jit-wrapped with a forced readback (cross-run numbers
are invalid on this host — docs/PERF.md methodology).

Pieces:
  band       remap_band_fast_chunked (row_bound / chunk / col einsum
             precision sweeps)
  bandcol    column-matmul pass only (vertical MACs skipped)
  bandrow    vertical masked-MAC pass only (column matmul skipped)
  stitch     remap_const_stitch_chunked (the fused dual-CMOS tail)

Usage: python tools/ablate_remap.py [--lines 32768]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from common import ensure_platform, timeit  # noqa: E402

ensure_platform()


def _guarded(label: str, fn):
    """Time one entry; a COMPILE failure (e.g. a Mosaic VMEM rejection on
    some config) reports and moves on instead of killing the whole sweep
    (the 2026-08-18 session lost the fused-kernel A/Bs to one bad
    config).  A runtime RESOURCE_EXHAUSTED still aborts: an OOM'd
    execution poisons subsequent device ops (docs/PERF.md), so timings
    taken after one would be garbage presented as data."""
    try:
        fn()
    except Exception as exc:  # noqa: BLE001 — survey tool, keep sweeping
        print(f"{label}: FAILED {type(exc).__name__}: {str(exc)[:160]}")
        if "RESOURCE_EXHAUSTED" in str(exc):
            print("device OOM poisons later timings — aborting sweep")
            raise


def main(args):

    import jax
    import jax.numpy as jnp

    from opticalimageprocessor_tpu.constants import (
        MSS_BANDS,
        PIXELS_PER_LINE,
        PIXELS_PER_MSSBAND,
    )
    from opticalimageprocessor_tpu.ops import resample, rrc

    rng = np.random.default_rng(0)
    lines_mss = args.lines // MSS_BANDS
    band = jnp.asarray(
        rng.integers(0, 65535, (lines_mss, PIXELS_PER_MSSBAND), np.uint16)
    )
    mss4 = jnp.asarray(
        rng.integers(
            0, 65535, (MSS_BANDS, lines_mss, PIXELS_PER_MSSBAND), np.uint16
        )
    )
    pan1 = jnp.asarray(
        rng.integers(0, 65535, (args.lines, PIXELS_PER_LINE), np.uint16)
    )
    pan2 = jnp.asarray(
        rng.integers(0, 65535, (args.lines, PIXELS_PER_LINE), np.uint16)
    )
    p1 = jnp.asarray(rrc.split_rrc_params(np.ones(PIXELS_PER_LINE),
                                          np.zeros(PIXELS_PER_LINE)))
    cx = jnp.asarray([0.8, -1.2e-5], jnp.float32)
    cy = jnp.asarray([1.5, 1.0e-5, -3e-10], jnp.float32)
    dx = jnp.float32(-3.2)
    dy = jnp.float32(2.4)

    print(f"lines={args.lines} (band {lines_mss}x{PIXELS_PER_MSSBAND}, "
          f"pan {args.lines}x{PIXELS_PER_LINE})")

    # -- full band remap sweeps (x4 bands to match the pipeline stage) ----
    for rb in (1, 3, 6):
        for chunk in (512, 2048):
            f = jax.jit(lambda m, cx=cx, cy=cy, rb=rb, chunk=chunk: jnp.stack(
                [
                    resample.remap_band_fast_chunked(
                        m[i], cx, cy, chunk_rows=chunk, row_bound=rb,
                        col_block=128, col_halo=16,
                    )
                    for i in range(MSS_BANDS)
                ], axis=-1))
            _guarded(
                f"band x4: row_bound={rb} chunk={chunk}",
                lambda f=f, rb=rb, chunk=chunk: print(
                    "band x4: row_bound=%d chunk=%d min=%.1f med=%.1f ms"
                    % (rb, chunk, *timeit(f, (mss4,), args.n))
                ),
            )

    # -- band remap with the opt-in Pallas vertical pass (TPU only) -------
    if jax.default_backend() != "tpu":
        print("band x4 PALLAS-rowpass: skipped (needs TPU)")
    else:
        try:
            resample.set_row_pass_pallas(True)
            for chunk in (512, 2048):
                f = jax.jit(lambda m, cx=cx, cy=cy, chunk=chunk: jnp.stack(
                    [
                        resample.remap_band_fast_chunked(
                            m[i], cx, cy, chunk_rows=chunk, row_bound=3,
                            col_block=128, col_halo=16,
                        )
                        for i in range(MSS_BANDS)
                    ], axis=-1))
                _guarded(
                    f"band x4 PALLAS-rowpass: chunk={chunk}",
                    lambda f=f, chunk=chunk: print(
                        "band x4 PALLAS-rowpass: chunk=%d min=%.1f "
                        "med=%.1f ms" % (chunk, *timeit(f, (mss4,), args.n))
                    ),
                )
        finally:
            resample.set_row_pass_pallas(False)

    # -- band remap with the FUSED col+row Pallas kernel (TPU only) -------
    if jax.default_backend() != "tpu":
        print("band x4 FUSED-pallas: skipped (needs TPU)")
    else:
        for tr in (256, 512):

            def fused_fn(m, cx=cx, cy=cy, tr=tr):
                cmat = resample._col_interp_matrix(
                    cx, PIXELS_PER_MSSBAND, 128, 16
                )
                g = resample._band_g(cy, PIXELS_PER_MSSBAND)
                halo = 3 + 2
                outs = [
                    resample._remap_fused_pallas(
                        jnp.pad(m[i], ((halo, halo), (0, 0))),
                        m.shape[1], cmat, g, 3, tile_rows=tr,
                    )
                    for i in range(MSS_BANDS)
                ]
                return jnp.stack(outs, axis=-1)

            _guarded(
                f"band x4 FUSED-pallas: tile_rows={tr}",
                lambda fn=fused_fn, tr=tr: print(
                    "band x4 FUSED-pallas: tile_rows=%d min=%.1f med=%.1f ms"
                    % (tr, *timeit(jax.jit(fn), (mss4,), args.n))
                ),
            )

    # -- column matmul only (one band) ------------------------------------
    cm = resample._col_interp_matrix(cx, PIXELS_PER_MSSBAND, 128, 16)
    ck = min(512, lines_mss)

    def col_only(m):
        def one(i):
            blk = jax.lax.dynamic_slice_in_dim(m, i * ck, ck, 0)
            return resample._col_interp_apply(blk.astype(jnp.float32), cm)
        n_chunks = lines_mss // ck
        out = jax.lax.map(one, jnp.arange(n_chunks))
        return jnp.clip(jnp.rint(out), 0, 65535).astype(jnp.uint16)

    _guarded(
        "bandcol x1",
        lambda: print(
            "bandcol x1: chunk=512 min=%.1f med=%.1f ms"
            % timeit(jax.jit(col_only), (band,), args.n)
        ),
    )

    # -- vertical MAC pass only (one band) ---------------------------------
    for rb in (1, 3, 6):
        g = resample._band_g(cy, PIXELS_PER_MSSBAND)
        halo = rb + 2

        def row_only(m, rb=rb, halo=halo, g=g):
            padded = jnp.pad(m.astype(jnp.float32),
                             ((halo + 1, halo + 1), (0, 0)))

            def one(i):
                blk = jax.lax.dynamic_slice_in_dim(
                    padded, i * ck, ck + 2 * halo, 0)
                acc = resample._fast_row_pass(
                    blk, g, ck, PIXELS_PER_MSSBAND, rb, 0)
                return jnp.clip(jnp.rint(acc), 0, 65535).astype(jnp.uint16)

            n_chunks = lines_mss // ck
            return jax.lax.map(one, jnp.arange(n_chunks))

        _guarded(
            f"bandrow x1: row_bound={rb}",
            lambda rb=rb, row_only=row_only: print(
                "bandrow x1: row_bound=%d min=%.1f med=%.1f ms"
                % (rb, *timeit(jax.jit(row_only), (band,), args.n))
            ),
        )

    # -- fused stitch tail --------------------------------------------------
    for chunk in (512, 2048):
        f = jax.jit(
            lambda a, b, dx=dx, dy=dy, chunk=chunk:
            resample.remap_const_stitch_chunked(
                a, b, p1, p1, dx, dy, 200, chunk_rows=chunk,
                row_bound=8, col_block=128, col_halo=16,
            )
        )
        _guarded(
            f"stitch: chunk={chunk}",
            lambda f=f, chunk=chunk: print(
                "stitch: chunk=%d min=%.1f med=%.1f ms"
                % (chunk, *timeit(f, (pan1, pan2), args.n))
            ),
        )

    # -- stitch tail with the FUSED Pallas prestt kernel (TPU only) -------
    if jax.default_backend() != "tpu":
        print("stitch FUSED-pallas: skipped (needs TPU)")
    else:
        try:
            resample.set_fused_remap_pallas(True)
            f = jax.jit(
                lambda a, b, dx=dx, dy=dy:
                resample.remap_const_stitch_chunked(
                    a, b, p1, p1, dx, dy, 200, chunk_rows=512,
                    row_bound=8, col_block=128, col_halo=16,
                )
            )
            _guarded(
                "stitch FUSED-pallas",
                lambda f=f: print(
                    "stitch FUSED-pallas: min=%.1f med=%.1f ms"
                    % timeit(f, (pan1, pan2), args.n)
                ),
            )
        finally:
            resample.set_fused_remap_pallas(False)


def register_scaling(lines, n):
    """Attribute the register stage: does time scale linearly with the
    tile count (compute-bound) or sublinearly (fixed overhead), and how
    much is the lone PAN-tile rfft2?"""
    import jax
    import jax.numpy as jnp

    from opticalimageprocessor_tpu.constants import (
        MSS_BANDS,
        PIXELS_PER_LINE,
        PIXELS_PER_MSSBAND,
    )
    from opticalimageprocessor_tpu.models.device_pipeline import register_fast
    from opticalimageprocessor_tpu.ops import fft_mxu, phasecorr

    if jax.default_backend() == "tpu":
        fft_mxu.set_stage_dtype(jnp.bfloat16)  # bench.py's fast mode
    rng = np.random.default_rng(0)
    lines_mss = lines // MSS_BANDS
    pan = jnp.asarray(
        rng.integers(0, 65535, (lines, PIXELS_PER_LINE), np.uint16)
    )
    mss = jnp.asarray(
        rng.integers(
            0, 65535, (MSS_BANDS, lines_mss, PIXELS_PER_MSSBAND), np.uint16
        )
    )

    for slices, nsec in ((5, 1), (10, 1), (5, 2), (10, 2)):
        f = jax.jit(
            lambda p, m, s=slices, ns=nsec: register_fast(
                p, m, slices=s, n_sections=ns
            )[1]
        )
        _guarded(
            f"register: slices={slices} sections={nsec}",
            lambda f=f, slices=slices, nsec=nsec: print(
                "register: slices=%d sections=%d (%d tiles) min=%.1f "
                "med=%.1f ms"
                % (slices, nsec, slices * nsec, *timeit(f, (pan, mss), n))
            ),
        )

    # lone PAN-tile forward rfft2 at the default tile shape
    corr_rows, cols = 16000, PIXELS_PER_LINE // 10
    tile = jnp.asarray(
        rng.integers(0, 65535, (corr_rows, cols), np.uint16)
    ).astype(jnp.float32)
    f = jax.jit(
        lambda t: phasecorr.rfft2_padded(t, (corr_rows, cols), True)[0]
    )
    mn, md = timeit(f, (tile,), n)
    print(f"pan rfft2 {corr_rows}x{cols}: min={mn:.2f} med={md:.2f} ms "
          f"(x20 tiles = {20 * mn:.0f} ms lower bound)")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=32768)
    ap.add_argument("--n", type=int, default=5)
    ap.add_argument(
        "--register", action="store_true",
        help="register-stage scaling probes instead of the remap sweeps",
    )
    a = ap.parse_args()
    if a.register:
        register_scaling(a.lines, a.n)
    else:
        main(a)
