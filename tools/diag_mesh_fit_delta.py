"""One-process A/B of the registration fit: resident ``register_fast``
vs the sharded-scene estimation (``_correlate_sharded`` + ``_fit_bands``)
on the same PAN/MSS strips.

Quantifies the mesh-vs-single coefficient wobble (FFT/partitioning f32
rounding differences between the lax.map and shard_map programs —
parallel/sharded_scene.py module docstring) and the implied pixel delta
across the band width, i.e. the mechanism behind the rare few-DN aligned
output diffs on white noise.

Run on a virtual mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python tools/diag_mesh_fit_delta.py SC1.PAN.RAW SC1.MSS.RAW [n_devices]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update(
    "jax_platforms",
    os.environ.get(
        "OIP_JAX_PLATFORM", os.environ.get("JAX_PLATFORMS", "cpu")
    ),
)

from opticalimageprocessor_tpu.constants import MSS_BANDS, PIXELS_PER_LINE
from opticalimageprocessor_tpu.models.device_pipeline import register_fast
from opticalimageprocessor_tpu.ops import fft_mxu
from opticalimageprocessor_tpu.parallel import sharded_scene
from opticalimageprocessor_tpu.parallel.mesh import LINE_AXIS
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def main():
    pan_file, mss_file = sys.argv[1], sys.argv[2]
    n_dev = int(sys.argv[3]) if len(sys.argv) > 3 else 8
    slices = 10

    if jax.default_backend() not in ("cpu",):
        fft_mxu.set_stage_dtype(jnp.bfloat16)
    pan = np.fromfile(pan_file, np.uint16).reshape(-1, PIXELS_PER_LINE)
    lines_pan = pan.shape[0]
    band_px = PIXELS_PER_LINE // MSS_BANDS
    mssi = np.fromfile(mss_file, np.uint16).reshape(-1, PIXELS_PER_LINE)
    mss = np.ascontiguousarray(
        np.transpose(mssi.reshape(-1, MSS_BANDS, band_px), (1, 0, 2))
    )

    fused = jax.default_backend() not in ("cpu",)
    coeffs_res, nv_res = register_fast(
        jnp.asarray(pan), jnp.asarray(mss), slices=slices, use_fused=fused
    )
    coeffs_res = jax.tree.map(np.asarray, coeffs_res)

    geom = sharded_scene._RegGeom.build(lines_pan, PIXELS_PER_LINE, slices, None)
    devs = jax.devices()[:n_dev]
    mesh = Mesh(np.array(devs), (LINE_AXIS,))
    shard = NamedSharding(mesh, P(LINE_AXIS))
    pan_s = jax.device_put(jnp.asarray(pan), shard)
    mss_c = jax.device_put(
        jnp.asarray(mss), NamedSharding(mesh, P(None, LINE_AXIS))
    )
    dx, dy, rs = sharded_scene._correlate_sharded(
        mesh, pan_s, mss_c, geom, fused, (64, 64)
    )
    cx, cy, nv_sh = sharded_scene._fit_bands(
        geom.centers, dx, dy, rs, 0.4
    )
    coeffs_sh = [(np.asarray(cx[b]), np.asarray(cy[b])) for b in range(MSS_BANDS)]

    print("band  max|dcoef_x|    max|dcoef_y|    max px delta over width")
    worst = 0.0
    for b in range(MSS_BANDS):
        rx, ry = coeffs_res[b]
        sx, sy = coeffs_sh[b]
        dxc = np.max(np.abs(np.asarray(rx) - sx))
        dyc = np.max(np.abs(np.asarray(ry) - sy))
        # evaluate both polynomials across the PAN width
        xs = np.arange(0, PIXELS_PER_LINE, 64, dtype=np.float64)
        px = np.polyval(np.asarray(rx)[::-1], xs) - np.polyval(sx[::-1], xs)
        py = np.polyval(np.asarray(ry)[::-1], xs) - np.polyval(sy[::-1], xs)
        d = max(np.max(np.abs(px)), np.max(np.abs(py)))
        worst = max(worst, d)
        print(f"  {b}   {dxc:.3e}     {dyc:.3e}     {d:.3e}")
    print(f"n_valid resident={np.asarray(nv_res)} sharded={np.asarray(nv_sh)}")
    print(f"WORST px delta: {worst:.3e}")


if __name__ == "__main__":
    main()
