"""Whole-scene fused pipeline (the CLI's ``scene`` subcommand).

One jitted device program covers what the reference runs as three separate
processes over intermediate files (``DOC/sample-task.sh`` steps 1-3:
prestitch -> stitch -> align): RRC of both PANs and the MSS bands,
PAN<->MSS registration + polynomial fit, stt-parameter estimation on the
dual-CMOS overlap, the alignment and prestitch resamples, and the seam
concat — HBM-resident end to end (models/device_pipeline, the bench.py
surface).  Outputs the CMOS1 ALIGNED.TIFF and the stitched PAN in one run,
with the reference's validity failures (``Not enough valid correlation
values``, ``No valid delta value found``) surfaced identically.

``mesh=N`` runs the same fused pipeline SPMD over an N-device 'line' mesh
(parallel/sharded_scene): strips are ingested shard-by-shard straight from
the memory maps (bounded host RSS) and the output rasters are drained via
the offset-write drains (parallel/distributed) — byte-identical to the
sequential writers single-process, and in a multi-host (``OIP_DIST_*``)
launch each process writes only its own rows into the shared files — the
multi-chip scaling path for the flagship program.

Fast-mode semantics (documented in ops/resample / models/device_pipeline):
within 1 DN of the file-materialised parity pipelines.  This resident
variant holds the scene in HBM (~10x the PAN strip bytes per chip); for
scenes beyond that, ``scene --stream`` (models/scene_stream) runs the
same math in bounded-memory sections with bit-identical outputs.
"""

from __future__ import annotations

import os

import numpy as np

from ..constants import (
    BYTES_PER_PIXEL,
    IBCV_DEF_THRESHOLD,
    IBPA_STEM_EXT,
    MSS_BANDS,
    PIXELS_PER_LINE,
    TIFF_FILE_EXT,
)
from ..formats.naming import build_output_file_path
from ..formats.rrc_csv import load_split_params
from ..io import raw as raw_io
from ..io import tiff as tiff_io
from ..utils.logging import olog, stage


def log_band_coeffs(cx, cy, n_valid) -> None:
    """OLOG the fitted per-band shift polynomials in the PreProcessor's
    format (the reference logs every fit, preproc.h:552-560) so scene runs
    are diagnosable from oip.log like the align route's."""
    cx, cy = np.asarray(cx, np.float64), np.asarray(cy, np.float64)
    for b in range(cx.shape[0]):
        olog(
            "Inter-band shifting of MSB%d: %d valid values", b + 1,
            int(np.asarray(n_valid)[b]),
        )
        olog("\tdeltaX coeff: [1] %.15f, [0] %.9f", cx[b, 1], cx[b, 0])
        olog(
            "\tdeltaY coeff: [2] %.15f, [1] %.15f, [0] %.9f",
            cy[b, 2], cy[b, 1], cy[b, 0],
        )


def log_scene_params(params, n_valid, n_stt: int) -> None:
    """OLOG the whole fused step's estimated parameters: per-band
    registration fits + the averaged stt deltas (stitcher.h:196-199's
    "everage value" log prints the RAW average, reference semantics);
    when the static-band clamp engaged, also log the clamped values the
    prestitch resample actually consumed."""
    cx, cy, stt_dx, stt_dy, raw_dx, raw_dy = params
    log_band_coeffs(cx, cy, n_valid)
    stt_dx, stt_dy = float(stt_dx), float(stt_dy)
    raw_dx, raw_dy = float(raw_dx), float(raw_dy)
    olog(
        "Total %d valid delta value pairs found, everage value: "
        "dx: %.5f, dy: %.5f",
        n_stt, raw_dx, raw_dy,
    )
    if (stt_dx, stt_dy) != (raw_dx, raw_dy):
        from ..utils.logging import logw

        logw(
            "stt deltas clamped to the supported resample band: "
            "dx %.5f -> %.5f, dy %.5f -> %.5f (raise col_halo / "
            "prestt-row-bound for larger mounting offsets)",
            raw_dx, stt_dx, raw_dy, stt_dy,
        )


def _row_blocks(arr, total_rows: int | None = None):
    """Yield the rows of a device array as host blocks in line order: one
    block per addressable shard for a line-sharded array (never
    materialising the whole raster), or the whole array on one device.
    ``total_rows`` trims the mesh-padding rows at the strip bottom
    (sharded arrays are padded to the mesh size)."""
    if total_rows is None:
        total_rows = arr.shape[0]
    shards = getattr(arr, "addressable_shards", None)
    if shards is not None and len(shards) > 1:
        from ..parallel.distributed import require_single_process_drain

        require_single_process_drain("scene _row_blocks")
        for sh in sorted(
            shards, key=lambda s: s.index[0].start or 0
        ):
            a = sh.index[0].start or 0
            if a >= total_rows:
                break
            yield np.asarray(sh.data)[: total_rows - a]
    else:
        yield np.asarray(arr)[:total_rows]


def run_scene(*args, profile_dir: str = "", **kw):
    """Run the fused scene pipeline (see :func:`_run_scene`); with
    ``profile_dir`` the whole run is wrapped in a JAX device profile
    (utils.logging.device_profile)."""
    from ..utils.logging import device_profile

    with device_profile(profile_dir):
        return _run_scene(*args, **kw)


def _run_scene(
    pan1_file: str,
    pan2_file: str,
    mss_file: str,
    rrc_pan1: str = "",
    rrc_pan2: str = "",
    rrc_mss_files: tuple[str, str, str, str] | None = None,
    mss2_file: str = "",
    rrc_mss2_files: tuple[str, str, str, str] | None = None,
    slices: int = 10,
    sections: int | None = None,
    fold_cols: int = 200,
    stt_sections: int = 10,
    threshold: float = IBCV_DEF_THRESHOLD,
    stt_threshold: float = IBCV_DEF_THRESHOLD,
    stt_max_delta_y: float = 0.0,
    out_stitched: str = "",
    out_stitched_mss: str = "",
    out_dir: str | None = None,
    pixels_per_line: int = PIXELS_PER_LINE,
    bgr_tiff_order: bool = True,
    mesh: int = 0,
):
    """Run the fused scene pipeline; returns a dict of output paths
    (``aligned``, ``stitched``; with ``mss2_file`` also ``aligned2`` and
    ``stitched_mss``).

    With ``mss2_file`` the run covers the reference's full
    ``DOC/sample-task.sh`` workflow: CMOS2's MSS registers and aligns
    against the *prestitched* PAN2 (the sample task's step 3.2 uses
    ``S1_PAN2 = *.RRC.PRESTT.RAW``), and the two ALIGNED rasters stitch
    into one wide MSS image with ``fold_cols/4`` fold columns (the MSS
    bands are 1/4 the PAN resolution, sample-task.sh FOLDCOL_MSS).

    ``mesh=N`` executes SPMD over an N-device line mesh (0 = single
    device)."""
    import jax
    import jax.numpy as jnp

    from .device_pipeline import (
        check_registration_valid,
        check_stt_valid,
        make_device_pipeline,
        make_mss_align,
    )

    if mss2_file and out_stitched_mss and (
        os.path.splitext(out_stitched_mss)[1].lower() not in (".tiff", ".tif")
    ):
        # fail before minutes of device compute; multi-band stitched output
        # is TIFF-only (stitch_tiff parity)
        raise ValueError("Output file should be a tiff image")

    band_px = pixels_per_line // MSS_BANDS
    p1 = raw_io.RawStrip(pan1_file, pixels_per_line)
    p2 = raw_io.RawStrip(pan2_file, pixels_per_line)
    ms = raw_io.RawStrip(mss_file, pixels_per_line)
    if p1.nbytes != p2.nbytes:
        raise ValueError("PAN1 size doesn't match PAN2 size")
    raw_io.check_pan_mss_sizes(p1, ms)
    olog("Scene: PAN %d lines, MSS %d lines.", p1.lines, ms.lines)

    if mesh < 0:
        raise ValueError(f"mesh must be >= 0, got {mesh}")
    if jax.process_count() > 1 and not mesh:
        # without a mesh every process would run the whole scene redundantly
        # and race on the same output files
        raise RuntimeError(
            f"multi-host scene run ({jax.process_count()} processes) "
            "requires --mesh N so strips shard across the processes' "
            "devices and each process drains only its own rows"
        )
    if mesh and len(jax.devices()) < mesh:
        raise RuntimeError(
            f"--mesh {mesh} needs {mesh} devices, only "
            f"{len(jax.devices())} available"
        )
    mesh_obj = None
    if mesh:
        from jax.sharding import NamedSharding, PartitionSpec as P

        from ..parallel.mesh import LINE_AXIS, line_mesh

        mesh_obj = line_mesh(mesh)
        olog(
            "Sharded scene over %d-device '%s' mesh.",
            mesh_obj.shape[LINE_AXIS], LINE_AXIS,
        )

    def load_pan(strip):
        if mesh_obj is None:
            return jnp.asarray(np.asarray(strip))
        from ..parallel.sharded import ingest_line_sharded

        return ingest_line_sharded(
            mesh_obj, strip._mm, strip.lines, 0, P(LINE_AXIS, None)
        )

    def load_bands(strip):
        # raw MSS line = 4 contiguous band segments; bands to leading axis
        view = strip._mm.reshape(strip.lines, MSS_BANDS, band_px).transpose(
            1, 0, 2
        )
        if mesh_obj is None:
            return jnp.asarray(np.ascontiguousarray(view))
        from ..parallel.sharded import ingest_line_sharded

        return ingest_line_sharded(
            mesh_obj, view, strip.lines, 1, P(None, LINE_AXIS, None)
        )

    def band_params(files):
        return jnp.asarray(
            np.stack(
                [load_split_params(f, band_px) for f in files or ("",) * 4]
            )
        )

    with stage("scene_load", p1.nbytes * 2 + ms.nbytes):
        pan1 = load_pan(p1)
        pan2 = load_pan(p2)
        mss = load_bands(ms)
    pan1_params = jnp.asarray(load_split_params(rrc_pan1, pixels_per_line))
    pan2_params = jnp.asarray(load_split_params(rrc_pan2, pixels_per_line))
    mss_params = band_params(rrc_mss_files)

    common = dict(
        slices=slices, n_sections=sections, fold=fold_cols // 2,
        stt_sections=stt_sections,
        # the stt windows span the physical CMOS overlap, which is what
        # the stitch folds away (stitcher.h: stitch-overlap == fold cols)
        overlap_cols=fold_cols,
        threshold=threshold,
        stt_threshold=stt_threshold,
        stt_max_delta_y=stt_max_delta_y,
        return_prestt=bool(mss2_file),
    )
    if mesh_obj is None:
        pipeline = make_device_pipeline(**common)
    else:
        from ..parallel.sharded_scene import make_sharded_scene_fn

        pipeline = make_sharded_scene_fn(
            mesh_obj, p1.lines, pixels_per_line, **common
        )
    with stage("scene_pipeline", p1.nbytes * 2 + ms.nbytes):
        if mss2_file:
            aligned, stitched, prestt, n_valid, n_stt, params = pipeline(
                pan1, pan2, mss, pan1_params, pan2_params, mss_params
            )
        else:
            aligned, stitched, n_valid, n_stt, params = pipeline(
                pan1, pan2, mss, pan1_params, pan2_params, mss_params
            )
        jax.block_until_ready(stitched)
    check_registration_valid(np.asarray(n_valid))
    check_stt_valid(np.asarray(n_stt))
    log_scene_params(params, np.asarray(n_valid), int(n_stt))

    order = [2, 1, 0, 3] if bgr_tiff_order else [0, 1, 2, 3]

    def write_aligned_tiff(path, arr, rows):
        if mesh_obj is not None:
            # offset-write drain: byte-identical to the sequential writer
            # for uncompressed strip TIFFs (io.tiff.create_tiff_shell) and
            # multi-host capable — each process writes only its own shards
            from ..parallel.distributed import drain_line_sharded_to_tiff

            drain_line_sharded_to_tiff(arr, path, total=rows, order=order)
            return
        writer = tiff_io.TiffStripWriter(
            path, band_px, rows, samples=MSS_BANDS
        )
        for blk in _row_blocks(arr, rows):
            writer.write_rows(blk[:, :, order])
        writer.close()

    aligned_path = build_output_file_path(
        mss_file, IBPA_STEM_EXT, TIFF_FILE_EXT, out_dir=out_dir
    )
    with stage("scene_write_aligned", aligned.size * 2):
        write_aligned_tiff(aligned_path, aligned, ms.lines)
    olog("Aligned MSS written to %s", aligned_path)

    st_w = int(stitched.shape[1])
    if not out_stitched:
        out_stitched = os.path.join(
            out_dir or os.getcwd(),
            f"stitched_{st_w}n{BYTES_PER_PIXEL * 8}b{TIFF_FILE_EXT}",
        )
    out_is_tiff = os.path.splitext(out_stitched)[1].lower() in (
        ".tiff", ".tif",
    )
    with stage("scene_write_stitched", stitched.size * 2):
        if mesh_obj is not None:
            from ..parallel.distributed import (
                drain_line_sharded_to_raw,
                drain_line_sharded_to_tiff,
            )

            if out_is_tiff:
                drain_line_sharded_to_tiff(
                    stitched, out_stitched, total=p1.lines
                )
            else:
                drain_line_sharded_to_raw(
                    stitched, out_stitched, st_w, total=p1.lines
                )
        elif out_is_tiff:
            writer = tiff_io.TiffStripWriter(
                out_stitched, st_w, p1.lines, samples=1
            )
            for blk in _row_blocks(stitched, p1.lines):
                writer.write_rows(blk)
            writer.close()
        else:
            writer = raw_io.RawStripWriter(out_stitched, st_w)
            for blk in _row_blocks(stitched, p1.lines):
                writer.write_lines(blk)
            writer.close()
    olog("Stitched PAN written to %s", out_stitched)
    outs = {"aligned": aligned_path, "stitched": out_stitched}
    if not mss2_file:
        return outs

    # ---- CMOS2 MSS: align against the prestitched PAN2, then stitch the
    # two aligned rasters (sample-task.sh steps 3.2 + 4)
    ms2 = raw_io.RawStrip(mss2_file, pixels_per_line)
    raw_io.check_pan_mss_sizes(p2, ms2)
    with stage("scene_load_mss2", ms2.nbytes):
        mss2 = load_bands(ms2)
    mss2_params = band_params(rrc_mss2_files)
    if mesh_obj is None:
        align2 = make_mss_align(
            slices=slices, n_sections=sections, threshold=threshold
        )
    else:
        from ..parallel.sharded_scene import make_sharded_mss_align_fn

        align2 = make_sharded_mss_align_fn(
            mesh_obj, p2.lines, pixels_per_line, slices=slices,
            n_sections=sections, threshold=threshold,
        )
    with stage("scene_align_mss2", ms2.nbytes):
        aligned2, n_valid2, coeffs2 = align2(prestt, mss2, mss2_params)
        jax.block_until_ready(aligned2)
    check_registration_valid(np.asarray(n_valid2))
    log_band_coeffs(coeffs2[0], coeffs2[1], np.asarray(n_valid2))

    aligned2_path = build_output_file_path(
        mss2_file, IBPA_STEM_EXT, TIFF_FILE_EXT, out_dir=out_dir
    )
    with stage("scene_write_aligned2", aligned2.size * 2):
        write_aligned_tiff(aligned2_path, aligned2, ms2.lines)
    olog("Aligned MSS (CMOS2) written to %s", aligned2_path)

    # stitch the aligned MSS pair: MSS fold columns are PAN's / 4
    # (sample-task.sh FOLDCOL_MSS), each side losing half at the seam
    foldm_half = max(1, fold_cols // MSS_BANDS // 2)
    half = band_px - foldm_half
    if not out_stitched_mss:
        out_stitched_mss = os.path.join(
            out_dir or os.getcwd(), f"stitched-MSS{TIFF_FILE_EXT}"
        )
    with stage("scene_write_stitched_mss", aligned.size * 4):
        if mesh_obj is not None:
            # seam-concat on device (both rasters share the line sharding;
            # the concat keeps it), then offset-drain — multi-host capable
            from ..parallel.distributed import drain_line_sharded_to_tiff

            stitched_mss = jax.jit(
                lambda a, b: jnp.concatenate(
                    [a[:, :half, :], b[:, foldm_half:, :]], axis=1
                )
            )(aligned, aligned2)
            drain_line_sharded_to_tiff(
                stitched_mss, out_stitched_mss, total=ms.lines, order=order
            )
        else:
            writer = tiff_io.TiffStripWriter(
                out_stitched_mss, 2 * half, ms.lines,
                samples=MSS_BANDS,
            )
            # both rasters share the sharding, so their row blocks pair up
            for b1, b2 in zip(
                _row_blocks(aligned, ms.lines),
                _row_blocks(aligned2, ms2.lines),
            ):
                writer.write_rows(
                    np.concatenate(
                        [
                            b1[:, :half, order],
                            b2[:, foldm_half:, order],
                        ],
                        axis=1,
                    )
                )
            writer.close()
    olog("Stitched MSS written to %s", out_stitched_mss)
    outs.update(
        {"aligned2": aligned2_path, "stitched_mss": out_stitched_mss}
    )
    return outs
