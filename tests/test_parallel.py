"""Multi-device tests on the virtual 8-device CPU mesh: halo exchange
correctness and sharded-vs-single-device pipeline consistency."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from opticalimageprocessor_tpu.parallel import halo, mesh as mesh_lib, sharded

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def test_exchange_halo_matches_concat(rng):
    m = mesh_lib.line_mesh(8)
    x = rng.random((64, 16), dtype=np.float32)
    top, bottom = 3, 2

    def local(xl):
        return halo.exchange_halo(xl, top, bottom, "line")

    out = jax.jit(
        jax.shard_map(
            local, mesh=m, in_specs=P("line", None),
            out_specs=P("line", None), check_vma=False,
        )
    )(x)
    out = np.asarray(out)
    # each shard's extended block stacked: verify shard 3's halo rows
    rows_local = 64 // 8
    blk = out.reshape(8, rows_local + top + bottom, 16)
    for d in range(8):
        want_top = (
            x[d * rows_local - top : d * rows_local]
            if d > 0
            else np.zeros((top, 16), np.float32)
        )
        want_bot = (
            x[(d + 1) * rows_local : (d + 1) * rows_local + bottom]
            if d < 7
            else np.zeros((bottom, 16), np.float32)
        )
        np.testing.assert_array_equal(blk[d, :top], want_top)
        np.testing.assert_array_equal(blk[d, top : top + rows_local],
                                      x[d * rows_local : (d + 1) * rows_local])
        np.testing.assert_array_equal(blk[d, top + rows_local :], want_bot)


def test_remap_dynamic_sharded_matches_single(rng):
    """The halo-exchanged sharded remap equals the single-shard whole-strip
    remap (interior and edges: border-0 at strip ends either way)."""
    rows, width = 128, 64
    band = rng.integers(0, 65536, (rows, width), dtype=np.uint16)
    cx = jnp.asarray([1.25, 2e-4], jnp.float32)
    cy = jnp.asarray([-0.5, 1e-4, 2e-8], jnp.float32)

    single = np.asarray(
        jax.jit(
            lambda b: sharded.remap_band_dynamic(b, cx, cy, 0, None)
        )(band)
    )

    m = mesh_lib.line_mesh(8)

    def local(bl):
        idx = jax.lax.axis_index("line")
        y0 = idx.astype(jnp.int32) * (rows // 8)
        return sharded.remap_band_dynamic(bl, cx, cy, y0, "line")

    multi = np.asarray(
        jax.jit(
            jax.shard_map(
                local, mesh=m, in_specs=P("line", None),
                out_specs=P("line", None), check_vma=False,
            )
        )(band)
    )
    np.testing.assert_array_equal(multi, single)


def test_remap_dynamic_matches_static_plan(rng):
    """Dynamic (traced-coefficient) remap agrees with the host-planned
    static remap used by the parity pipeline (same f32 math)."""
    from opticalimageprocessor_tpu.ops import resample

    rows, width = 96, 64
    band = rng.integers(0, 65536, (rows, width), dtype=np.uint16)
    cxv = [0.75, -3e-4]
    cyv = [1.25, -2e-4, 1e-8]
    want = np.asarray(
        resample.remap_polynomial_u16(jnp.asarray(band), cxv, cyv)
    )
    got = np.asarray(
        sharded.remap_band_dynamic(
            jnp.asarray(band),
            jnp.asarray(cxv, jnp.float32),
            jnp.asarray(cyv, jnp.float32),
            0,
            None,
        )
    )
    diff = np.abs(want.astype(int) - got.astype(int))
    # static plan computes maps in float64-then-cast and accumulates in the
    # oracle's grouped VPU order; the fast path is all-f32 with an MXU
    # column matmul -> last-ulp differences flip rounding on a few % of
    # pixels, never beyond 1 DN
    assert diff.max() <= 1
    assert (diff > 0).mean() < 0.05


def test_dryrun_multichip_entrypoint():
    import __graft_entry__ as ge

    ge.dryrun_multichip(8)


def test_entry_compiles():
    import __graft_entry__ as ge

    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    assert out.shape == (512, 3072) and out.dtype == jnp.uint16
