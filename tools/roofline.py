"""Roofline budgets for the two big fused-pipeline stages (docs/PERF.md).

For the register and stitch-tail stages at the stage-split config
(32768 lines), prints per-stage:

- XLA's own compiled cost analysis (flops + bytes accessed) — note XLA
  does NOT count the bodies of Pallas custom calls, so the register
  stage's fused cross-power kernel is additionally budgeted analytically;
- the analytic HBM byte floor (stage inputs + outputs, the minimum
  traffic any implementation must move);
- the analytic MXU FLOP budget of the DFT matmul chain (four-step
  factorisation, complex matmuls = 8*B*N*(n1+n2) real FLOPs per axis);
- floor times against the chip peaks, vs the measured net-of-RTT stage
  times from docs/PERF.md.

Peaks default to TPU v5e (197 bf16 TFLOP/s MXU, 819 GB/s HBM) —
override with OIP_PEAK_TFLOPS / OIP_PEAK_HBM_GBS.

Usage: python tools/roofline.py [--lines 32768]
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))  # repo root (the package)
sys.path.insert(0, _HERE)
from common import ensure_platform  # noqa: E402

ensure_platform()

PEAK_TFLOPS = float(os.environ.get("OIP_PEAK_TFLOPS", 197.0))
PEAK_HBM_GBS = float(os.environ.get("OIP_PEAK_HBM_GBS", 819.0))


def dft_flops(batch: int, n: int) -> float:
    """Real FLOPs of one complex DFT over the last axis of a (batch, n)
    array via the four-step factorisation (two complex matmul passes +
    twiddle rotation)."""
    from opticalimageprocessor_tpu.ops.fft_mxu import _factor

    n1, n2 = _factor(n)
    # pass 1: (batch*n2, n1) @ (n1, n1); pass 2: (batch*n1, n2) @ (n2, n2)
    # complex matmul = 4 real mult + 4 real add per MAC -> 8 flops
    return 8.0 * batch * n * (n1 + n2) + 6.0 * batch * n  # + twiddles


def cost(compiled):
    ca = compiled.cost_analysis()
    if isinstance(ca, list):
        ca = ca[0]
    return ca.get("flops", 0.0), ca.get("bytes accessed", 0.0)


def line(name, flops, bytes_, measured_ms):
    t_mxu = flops / (PEAK_TFLOPS * 1e12) * 1e3
    t_hbm = bytes_ / (PEAK_HBM_GBS * 1e9) * 1e3
    bound = max(t_mxu, t_hbm)
    msg = (
        f"{name:26s} flops={flops / 1e12:8.3f} T  bytes="
        f"{bytes_ / 1e9:7.2f} G  t_mxu={t_mxu:6.1f} ms  "
        f"t_hbm={t_hbm:6.1f} ms  floor={bound:6.1f} ms"
    )
    if measured_ms is not None:
        msg += (
            f"  measured~{measured_ms} ms "
            f"(x{measured_ms / max(bound, 1e-9):.1f} above floor)"
        )
    print(msg)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lines", type=int, default=32768)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from opticalimageprocessor_tpu.constants import (
        CORRELATION_LINES,
        MSS_BANDS,
        PIXELS_PER_LINE,
        PIXELS_PER_MSSBAND,
    )
    from opticalimageprocessor_tpu.models import device_pipeline as dp
    from opticalimageprocessor_tpu.ops import resample, rrc

    if jax.default_backend() == "tpu":
        from opticalimageprocessor_tpu.ops import fft_mxu

        fft_mxu.set_stage_dtype(jnp.bfloat16)

    lines = args.lines
    lines_mss = lines // MSS_BANDS
    W, BW = PIXELS_PER_LINE, PIXELS_PER_MSSBAND
    rng = np.random.default_rng(0)
    # lower() only needs avals — no device transfer (matters via the tunnel)
    pan1 = jax.ShapeDtypeStruct((lines, W), jnp.uint16)
    pan2 = jax.ShapeDtypeStruct((lines, W), jnp.uint16)
    mss_c = jax.ShapeDtypeStruct((MSS_BANDS, lines_mss, BW), jnp.uint16)
    p1p = jnp.asarray(
        rrc.split_rrc_params(
            0.98 + 0.04 * rng.random(W), rng.normal(0, 20, W)
        )
    )
    # measured net-of-RTT stage times (docs/PERF.md) are for the 32768-line
    # stage-split config only
    meas = (
        {"reg": 57, "stitch": 53, "align": 28} if lines == 32768
        else {"reg": None, "stitch": None, "align": None}
    )

    print(
        f"backend={jax.default_backend()} lines={lines} peaks: "
        f"{PEAK_TFLOPS} TFLOP/s, {PEAK_HBM_GBS} GB/s"
    )

    # ---- register stage --------------------------------------------------
    f_reg = jax.jit(lambda p, m, pp: dp.register_fast(p, m, pan_params=pp)[1])
    c_reg = f_reg.lower(pan1, mss_c, p1p).compile()
    xla_flops, xla_bytes = cost(c_reg)

    # geometry (mirrors register_fast's fast mode)
    corr_rows = min(lines, CORRELATION_LINES)
    corr_rows = max(64, corr_rows - corr_rows % 64)
    n_sections = max(1, min(5, lines // CORRELATION_LINES))
    slices = 10
    cols = W // slices
    brows, bcols = corr_rows // MSS_BANDS, cols // MSS_BANDS
    tiles = n_sections * slices
    kw = cols // 2 + 1

    # analytic HBM floor: every sampled tile read once (uint16), band
    # tiles likewise; outputs are tiny (per-tile dx/dy/response)
    io_bytes = tiles * (
        corr_rows * cols * 2 + MSS_BANDS * brows * bcols * 2
    )

    # analytic MXU budget per tile: PAN rfft2 (rows-axis DFT on cols
    # batch + cols-axis DFT on rows batch) + per-band small FFT
    # (brows x bcols) + the fused kernel's cross-power work (elementwise,
    # negligible FLOPs vs the DFTs) + windowed inverse DFT (win x win
    # output from kept spectrum: two slim matmuls)
    win = 64
    per_tile = (
        dft_flops(cols, corr_rows)      # PAN rows-axis DFT
        + dft_flops(corr_rows, cols)    # PAN cols-axis DFT
        + MSS_BANDS * (
            dft_flops(bcols, brows) + dft_flops(brows, bcols)
        )
        # windowed inverse: (win, corr_rows)x(corr_rows, kw) then
        # (win, kw)x(kw, win) complex-ish -> 8 flops/MAC
        + MSS_BANDS * 8.0 * win * kw * (corr_rows + win)
    )
    mxu_flops = tiles * per_tile
    print("\nregister (fast, fused kernel):")
    print(f"  tiles={tiles} of ({corr_rows}, {cols}); bands ({brows}, {bcols})")
    line("  xla cost_analysis", xla_flops, xla_bytes, None)
    line("  analytic (DFT+IO)", mxu_flops, io_bytes, meas["reg"])

    # ---- stitch tail -----------------------------------------------------
    f_st = jax.jit(
        lambda a, b: resample.remap_const_stitch_chunked(
            a, b, p1p, p1p, jnp.float32(-3.2), jnp.float32(2.4), 200,
            chunk_rows=512, row_bound=8, col_block=128, col_halo=16,
        )
    )
    c_st = f_st.lower(pan1, pan2).compile()
    xla_flops, xla_bytes = cost(c_st)
    # HBM floor: read both PAN strips once, write the stitched raster once
    st_w = 2 * (W - 100)
    io_bytes = lines * W * 2 * 2 + lines * st_w * 2
    # MXU budget: banded column matmul over PAN2 (per output px: one
    # (1 x 2*col_halo+?) f32 dot per column block) — remap math is
    # row-tap MAC + (col_block + 2*halo) x col_block column matmul per
    # block: ~2 * (col_block + 2*halo) flops per output px; row taps
    # ~2 * (2*row_bound+4) flops/px
    col_block, col_halo, row_bound = 128, 16, 8
    per_px = 2.0 * (col_block + 2 * col_halo) + 2.0 * (2 * row_bound + 4)
    mxu_flops = lines * W * per_px          # PAN2 remap only; concat is IO
    print("\nstitch tail (RRC ++ const remap ++ concat):")
    line("  xla cost_analysis", xla_flops, xla_bytes, None)
    line("  analytic (remap+IO)", mxu_flops, io_bytes, meas["stitch"])

    # ---- align resample (context) -----------------------------------------
    cx = jnp.asarray([0.8, -1.2e-5], jnp.float32)
    cy = jnp.asarray([1.5, 1.0e-5, -3e-10], jnp.float32)
    f_al = jax.jit(
        lambda m: jnp.stack(
            [
                resample.remap_band_fast_chunked(
                    m[i], cx, cy, chunk_rows=512, row_bound=3,
                    col_block=128, col_halo=16,
                )
                for i in range(MSS_BANDS)
            ],
            axis=-1,
        )
    )
    c_al = f_al.lower(mss_c).compile()
    xla_flops, xla_bytes = cost(c_al)
    io_bytes = 2 * MSS_BANDS * lines_mss * BW * 2
    per_px = 2.0 * (col_block + 2 * col_halo) + 2.0 * (2 * 3 + 4)
    print("\nalign resample x4:")
    line("  xla cost_analysis", xla_flops, xla_bytes, None)
    line("  analytic (remap+IO)", MSS_BANDS * lines_mss * BW * per_px,
         io_bytes, meas["align"])


if __name__ == "__main__":
    main()
