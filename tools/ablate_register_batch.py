"""Same-process A/B of the registration tile batching (docs/PERF.md's
"untried big hammer"): lax.map-per-tile vs tile-grid-batched register_fast.

Run on the real TPU:  python tools/ablate_register_batch.py [lines]

Times ONLY the registration stage (jitted standalone, dispatch->block->
readback of the small outputs) for each variant in one process, so host
slow phases cancel out of the comparison.
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from opticalimageprocessor_tpu.constants import (
    PIXELS_PER_LINE,
    PIXELS_PER_MSSBAND,
)
from opticalimageprocessor_tpu.models.device_pipeline import register_fast
from opticalimageprocessor_tpu.ops import fft_mxu


def time_variant(fn, args, n=6):
    outs = fn(*args)
    jax.block_until_ready(outs)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        outs = fn(*args)
        jax.block_until_ready(outs)
        # force readback of the small results (block can return early
        # through the tunnel)
        np.asarray(outs[1])
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts)), outs


def main():
    lines = int(sys.argv[1]) if len(sys.argv) > 1 else 32768
    fft_mxu.set_stage_dtype(jnp.bfloat16)
    rng = np.random.default_rng(7)
    pan = rng.integers(800, 3200, (lines, PIXELS_PER_LINE), dtype=np.uint16)
    mss = rng.integers(
        800, 3200, (4, lines // 4, PIXELS_PER_MSSBAND), dtype=np.uint16
    )
    pan_params = np.concatenate(
        [
            np.ones((1, PIXELS_PER_LINE), np.float32),
            np.zeros((5, PIXELS_PER_LINE), np.float32),
        ]
    )
    dev = jax.devices()[0]
    pan_d = jax.device_put(jnp.asarray(pan), dev)
    mss_d = jax.device_put(jnp.asarray(mss), dev)
    pp_d = jax.device_put(jnp.asarray(pan_params), dev)

    variants = [
        ("laxmap (r3 default)", dict(section_batch=1)),
        ("scan unroll=2", dict(section_batch=1, unroll=2)),
        ("scan unroll=5", dict(section_batch=1, unroll=5)),
        ("batched g=10 (full section)", dict(section_batch=10)),
        ("batched g=5", dict(section_batch=5)),
        ("batched g=2", dict(section_batch=2)),
    ]
    results = {}
    for name, kw in variants:
        fn = jax.jit(
            lambda p, m, pp, kw=kw: register_fast(
                p, m, use_fused=True, pan_params=pp, **kw
            )
        )
        try:
            t, outs = time_variant(fn, (pan_d, mss_d, pp_d))
        except Exception as e:  # OOM etc.
            print(f"{name:32s}  FAILED: {type(e).__name__}: {e}")
            continue
        results[name] = (t, outs)
        print(f"{name:32s}  {t * 1e3:8.1f} ms   n_valid={np.asarray(outs[1])}")

    if len(results) >= 2:
        names = list(results)
        ref = results[names[0]][1][0]
        for name in names[1:]:
            c = results[name][1][0]
            d = max(
                float(np.max(np.abs(np.asarray(c[b][k]) - np.asarray(ref[b][k]))))
                for b in range(4)
                for k in range(2)
            )
            print(f"coeff max|diff| {names[0]} vs {name}: {d:.2e}")


if __name__ == "__main__":
    main()
