"""Inter-band registration + alignment pipeline (the reference's default
command: ``PreProcessor``, preproc.h:30-599).

Stages (call stack parity with SURVEY §3.1):

1. geometry checks          (CheckFilesAttributes, preproc.h:552-572)
2. PAN/MSS load + band split (LoadPAN/LoadMSS, preproc.h:51-80) — here:
   memory-mapped, sectioned, bands as a leading array axis
3. RRC                      (DoRRC4PAN/DoRRC4MSS -> ops.rrc Pallas kernel)
4. inter-band correlation   (CalcInterBandCorrelation, preproc.h:224-347):
   slices x sections tile extraction, x4 cubic upsample of MSS tiles,
   batched phase correlation on the device
5. filter + polynomial fit  (FilterInterBandShiftValues /
   DoCorrelationPolynomialFitting, preproc.h:492-550)
6. sectioned alignment remap (DoInterBandAlignment, preproc.h:351-468) with
   the reference's 20000-line batches and 520-line trimmed overlap
7. ALIGNED.TIFF output      (WriteAlignedMSS_TIFF, preproc.h:167-185); note
   cv::imwrite treats 4-channel data as BGRA and stores RGBA, i.e. channels
   [2,1,0,3] — reproduced via ``bgr_tiff_order``.

TPU mapping: RRC and the alignment remap run as device kernels over
sections; all (sections x slices x bands) correlation tiles are batched into
one vmapped FFT; only the tiny shift statistics return to the host for the
float64 polynomial fit.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import jax.numpy as jnp
import numpy as np

from ..constants import (
    CORRELATION_LINES,
    IBCV_DEF_SECTIONS,
    IBCV_DEF_SLICES,
    IBCV_DEF_THRESHOLD,
    IBCV_MIN_SLICES,
    IBPA_DEFAULT_LINEOVERLAP,
    IBPA_MAX_LINEOVERLAP,
    IBPA_MIN_PROCESSLINES,
    IBPA_STEM_EXT,
    MSS_BANDS,
    PIXELS_PER_LINE,
    RRC_STEM_EXT,
    TIFF_FILE_EXT,
)
from ..formats.naming import build_output_file_path
from ..formats.rrc_csv import load_split_params
from ..io import raw as raw_io
from ..io import tiff as tiff_io
from ..ops import phasecorr, polyfit, resample, rrc
from ..utils.logging import olog, rlog, stage


@dataclass
class InterBandShift:
    """Per-tile shift sample (reference InterBandShift, preproc.h:23-28)."""

    dx: float
    dy: float
    rs: float
    cx: int


@dataclass
class PreProcessor:
    pan_file: str
    mss_file: str
    rrc_pan_file: str = ""
    rrc_mss_files: tuple[str, str, str, str] | None = None
    out_dir: str | None = None
    quantized_coords: bool = False
    bgr_tiff_order: bool = True
    pixels_per_line: int = PIXELS_PER_LINE   # test hook; camera default 12288
    # fast=True: TPU fast resample (blocked MXU matmuls, whole-strip chunked
    # streaming instead of the reference's bordered sections; within 1 DN of
    # the parity path, see ops/resample.remap_band_fast)
    fast: bool = False

    # populated by stages
    band_shifts: list[list[InterBandShift]] = field(default_factory=list)
    coeff_x: np.ndarray | None = None   # (4, 2) ascending
    coeff_y: np.ndarray | None = None   # (4, 3) ascending

    def __post_init__(self):
        self.band_px = self.pixels_per_line // MSS_BANDS
        self.pan = raw_io.RawStrip(self.pan_file, self.pixels_per_line)
        self.mss = raw_io.RawStrip(self.mss_file, self.pixels_per_line)
        self._check_files_attributes()
        self._pan_params = None       # (6, 12288) f32 split RRC, or None
        self._mss_params = None       # list of 4 (6, 3072), or None
        self._loaded = False

    # -- stage 1: geometry invariants (preproc.h:552-572) -------------------
    def _check_files_attributes(self):
        raw_io.check_pan_mss_sizes(self.pan, self.mss)
        self.lines_pan = self.pan.lines
        self.lines_mss = self.mss.lines
        olog("PAN: %d lines, MSS: %d lines.", self.lines_pan, self.lines_mss)

    # -- stages 2+3: load + RRC ---------------------------------------------
    def load_and_rrc(self, do_rrc_pan: bool = False, do_rrc_mss: bool = True):
        """Prepare the (RRC-corrected) strip accessors.

        Since round 3 the strips are no longer materialised whole: every
        consumer reads row ranges straight from the memory maps through
        :meth:`pan_rows` / :meth:`band_rows`, which apply the byte-exact
        RRC on demand — host RSS stays bounded by one section regardless
        of strip length (the blueprint's host-streamed sections, SURVEY
        §7; the reference materialises whole strips, imageop.h:110-127).
        Outputs are bit-identical to the materialised flow: RRC is
        elementwise and every later stage reads the same rows.
        """
        if do_rrc_pan:
            if not self.rrc_pan_file:
                raise ValueError("RRC parameter file of PAN needed")
            self._pan_params = jnp.asarray(
                load_split_params(self.rrc_pan_file, self.pixels_per_line)
            )
        if do_rrc_mss:
            if not self.rrc_mss_files or any(
                not f for f in self.rrc_mss_files
            ):
                raise ValueError("RRC parameter file of all MSS Bands needed")
            self._mss_params = [
                jnp.asarray(load_split_params(f, self.band_px))
                for f in self.rrc_mss_files
            ]
        self._loaded = True

    def pan_rows(self, a: int, b: int) -> np.ndarray:
        """(RRC-corrected) PAN rows [a, b) from the memory map."""
        rows = np.ascontiguousarray(self.pan.section(a, b - a))
        if self._pan_params is not None:
            rows = np.asarray(
                rrc.rrc_apply(jnp.asarray(rows), self._pan_params)
            )
        return rows

    def band_rows(self, band: int, a: int, b: int) -> np.ndarray:
        """(RRC-corrected) MSS band-``band`` rows [a, b): the raw MSS line
        is 4 contiguous band segments (preproc.h:62-75) — slice this
        band's segment out of the mapped rows, then RRC."""
        seg = np.ascontiguousarray(
            self.mss.section(a, b - a)
            .reshape(-1, MSS_BANDS, self.band_px)[:, band]
        )
        if self._mss_params is not None:
            seg = np.asarray(
                rrc.rrc_apply(jnp.asarray(seg), self._mss_params[band])
            )
        return seg

    _WRITE_CHUNK_ROWS = 4096

    def write_rrc_pan_raw(self):
        path = build_output_file_path(
            self.pan_file, RRC_STEM_EXT, out_dir=self.out_dir
        )
        with stage("write_rrc_pan", self.pan.nbytes), open(path, "wb") as f:
            for a in range(0, self.lines_pan, self._WRITE_CHUNK_ROWS):
                self.pan_rows(
                    a, min(a + self._WRITE_CHUNK_ROWS, self.lines_pan)
                ).tofile(f)
        return path

    def write_rrc_pan_tiff(self, line_offset: int = 0):
        path = build_output_file_path(
            self.pan_file, RRC_STEM_EXT, TIFF_FILE_EXT, out_dir=self.out_dir
        )
        rows = self.lines_pan - line_offset
        with stage("write_rrc_pan", rows * self.pixels_per_line * 2):
            w = tiff_io.TiffStripWriter(path, self.pixels_per_line, rows)
            for a in range(line_offset, self.lines_pan,
                           self._WRITE_CHUNK_ROWS):
                w.write_rows(
                    self.pan_rows(
                        a, min(a + self._WRITE_CHUNK_ROWS, self.lines_pan)
                    )
                )
            w.close()
        return path

    # -- stage 4: inter-band correlation ------------------------------------
    def calc_inter_band_correlation(
        self,
        slices: int = IBCV_DEF_SLICES,
        sections: int = IBCV_DEF_SECTIONS,
        threshold: float = IBCV_DEF_THRESHOLD,
    ):
        """Tile extraction + upsample + batched phase correlation
        (preproc.h:224-347, same sampling geometry)."""
        if slices < IBCV_MIN_SLICES:
            raise ValueError(
                f"CalcInterBandCorrelation: at lease {IBCV_MIN_SLICES} "
                "slice needed"
            )
        if sections <= 0:
            raise ValueError(
                "CalcInterBandCorrelation: section count should be a "
                "positive integer"
            )
        if sections > 1 and sections * CORRELATION_LINES > self.lines_pan:
            raise ValueError(
                "CalcInterBandCorrelation: too many sections "
                f"({CORRELATION_LINES} lines per section), not enough total "
                "PAN data lines"
            )
        assert self._loaded, "call load_and_rrc() first"

        base_rows = min(self.lines_pan, CORRELATION_LINES)
        base_gap = (self.lines_pan - base_rows * sections) // (sections + 1)
        cols = self.pixels_per_line // slices
        band_rows = base_rows // MSS_BANDS
        band_gap = base_gap // MSS_BANDS
        band_cols = cols // MSS_BANDS

        olog(
            "Calculating inter-band correlation with %d slices in %d "
            "section(s) ...", slices, sections,
        )
        # one sampled section in RAM at a time (bounded RSS); sectioning
        # the batch only regroups independent per-tile correlations
        centers = []
        sec_stats = []
        with stage("ibc_correlate"):
            for sec in range(sections):
                r0 = base_gap + sec * (base_rows + base_gap)
                br0 = band_gap + sec * (band_rows + band_gap)
                pan_block = self.pan_rows(r0, r0 + base_rows)
                band_blocks = [
                    self.band_rows(b, br0, br0 + band_rows)
                    for b in range(MSS_BANDS)
                ]
                pan_tiles = []
                band_tiles = []
                for i in range(slices):
                    pan_tiles.append(
                        pan_block[:, i * cols : (i + 1) * cols]
                    )
                    for b in range(MSS_BANDS):
                        band_tiles.append(
                            band_blocks[b][
                                :, i * band_cols : (i + 1) * band_cols
                            ]
                        )
                    centers.append(i * cols + cols // 2)
                sec_stats.append(
                    _correlate_tiles(
                        np.stack(pan_tiles), np.stack(band_tiles), MSS_BANDS
                    )
                )
        dxs, dys, rss = (
            np.concatenate([s[k] for s in sec_stats]) for k in range(3)
        )

        self.band_shifts = [[] for _ in range(MSS_BANDS)]
        for t in range(sections * slices):
            for b in range(MSS_BANDS):
                k = t * MSS_BANDS + b
                self.band_shifts[b].append(
                    InterBandShift(
                        dx=float(dxs[k]), dy=float(dys[k]), rs=float(rss[k]),
                        cx=centers[t],
                    )
                )
        self._dump_shift_table(slices, sections)
        self._fit(threshold)

    def _dump_shift_table(self, slices, sections):
        """The reference's QA table (DumpInterBandShiftValues,
        preproc.h:470-490)."""
        rlog(
            "|#SLC|Start|Center| End |   B1.x   |   B2.x   |   B3.x   |"
            "   B4.x   |   B1.y   |   B2.y   |   B3.y   |   B4.y   |"
            "   B1.r   |   B2.r   |   B3.r   |   B4.r   |"
        )
        cols = self.pixels_per_line // slices
        for s in range(sections):
            for i in range(slices):
                ii = i + s * slices
                sh = [self.band_shifts[b][ii] for b in range(MSS_BANDS)]
                rlog(
                    "|%4d|%5d|%6d|%5d|" % (i, i * cols, sh[0].cx, (i + 1) * cols)
                    + "".join(f"{x.dx:10.4f}|" for x in sh)
                    + "".join(f"{x.dy:10.4f}|" for x in sh)
                    + "".join(f"{x.rs:10.4f}|" for x in sh)
                )

    def _fit(self, threshold: float):
        """Filter + fit (preproc.h:492-550)."""
        self.coeff_x = np.zeros((MSS_BANDS, 2))
        self.coeff_y = np.zeros((MSS_BANDS, 3))
        for b in range(MSS_BANDS):
            shifts = self.band_shifts[b]
            rs = np.array([s.rs for s in shifts])
            cx = np.array([s.cx for s in shifts], np.float64)
            dx = np.array([s.dx for s in shifts])
            dy = np.array([s.dy for s in shifts])
            cxc, cyc = polyfit.fit_shift_models_filtered(
                cx, dx, dy, rs, threshold, b + 1
            )
            self.coeff_x[b] = cxc
            self.coeff_y[b] = cyc
            olog(
                "\tdeltaX coeff: [1] %.15f, [0] %.9f", cxc[1], cxc[0]
            )
            olog(
                "\tdeltaY coeff: [2] %.15f, [1] %.15f, [0] %.9f",
                cyc[2], cyc[1], cyc[0],
            )

    # -- stage 6: alignment --------------------------------------------------
    def do_inter_band_alignment(
        self,
        line_per_section: int,
        line_offset: int = 0,
        section_overlap: int = IBPA_DEFAULT_LINEOVERLAP,
        keep_leading_lines: bool = False,
        write_tiff: bool = True,
    ) -> np.ndarray | str:
        """Sectioned alignment remap (preproc.h:351-425), reproducing the
        reference's section geometry: ``line_per_section`` batches advancing
        by ``line_per_section - section_overlap``, each remapped with
        section-local maps (border value 0 at section edges), the first
        ``section_overlap`` output rows of each section trimmed.
        """
        if section_overlap > IBPA_MAX_LINEOVERLAP:
            raise ValueError(
                f"Overlap value {section_overlap} exceeds maximum allowed "
                f"value({IBPA_MAX_LINEOVERLAP})"
            )
        if line_per_section < section_overlap * 2:
            raise ValueError(
                "Lines per section too small or section overlapped lines too "
                "large"
            )
        if self.lines_mss - line_offset < IBPA_MIN_PROCESSLINES:
            raise ValueError("Too few image lines left to process")
        assert self.coeff_x is not None, "run calc_inter_band_correlation first"

        total_out = (
            self.lines_mss
            - line_offset
            - (0 if keep_leading_lines else section_overlap)
        )
        aligned = np.zeros((total_out, self.band_px, MSS_BANDS), np.uint16)

        if self.fast:
            skip = 0 if keep_leading_lines else section_overlap
            with stage("alignment_fast", self.mss.nbytes):
                # one band in flight at a time (bounded host RSS: the
                # remapped band is dropped as soon as it lands in `aligned`)
                for b in range(MSS_BANDS):
                    whole = np.asarray(
                        resample.remap_band_fast_chunked(
                            jnp.asarray(
                                self.band_rows(b, line_offset, self.lines_mss)
                            ),
                            self.coeff_x[b].astype(np.float32),
                            self.coeff_y[b].astype(np.float32),
                            chunk_rows=4096,
                        )
                    )
                    aligned[..., b] = whole[skip : skip + total_out]
            if not write_tiff:
                return aligned
            path = build_output_file_path(
                self.mss_file, IBPA_STEM_EXT, TIFF_FILE_EXT, out_dir=self.out_dir
            )
            out = (
                aligned[..., [2, 1, 0, 3]] if self.bgr_tiff_order else aligned
            )
            tiff_io.write_tiff(path, out)
            olog("Aligned MSS written to %s", path)
            return path

        plans = [
            resample.plan_for_band_alignment(
                self.coeff_x[b], self.coeff_y[b], self.band_px,
                self.quantized_coords,
            )
            for b in range(MSS_BANDS)
        ]

        offset = line_offset
        processed = 0
        sec_i = 0
        with stage("alignment", self.mss.nbytes):
            while True:
                lines = min(self.lines_mss - offset, line_per_section)
                if self.lines_mss < offset or lines < IBPA_MIN_PROCESSLINES:
                    break
                olog(
                    "[SEC%d] %d lines for processing [offset=%d].",
                    sec_i + 1, lines, offset,
                )
                merged = np.empty((lines, self.band_px, MSS_BANDS), np.uint16)
                for b in range(MSS_BANDS):
                    sec = self.band_rows(b, offset, offset + lines)
                    merged[:, :, b] = np.asarray(
                        resample.remap_section_u16(jnp.asarray(sec), plans[b])
                    )
                if sec_i == 0 and keep_leading_lines:
                    aligned[:section_overlap] = merged[:section_overlap]
                    processed += section_overlap
                n_keep = lines - section_overlap
                aligned[processed : processed + n_keep] = merged[
                    section_overlap:lines
                ]
                processed += n_keep
                offset += line_per_section - section_overlap
                sec_i += 1

        if not write_tiff:
            return aligned
        path = build_output_file_path(
            self.mss_file, IBPA_STEM_EXT, TIFF_FILE_EXT, out_dir=self.out_dir
        )
        out = aligned[..., [2, 1, 0, 3]] if self.bgr_tiff_order else aligned
        tiff_io.write_tiff(path, out)
        olog("Aligned MSS written to %s", path)
        return path


def _correlate_tiles(pan_tiles: np.ndarray, band_tiles: np.ndarray, bands: int):
    """Upsample band tiles x4 and phase-correlate against their PAN tiles.

    ``pan_tiles``: (T, H, W) u16; ``band_tiles``: (T*bands, H/4, W/4) u16
    ordered tile-major then band.  Returns per-(tile, band) dx/dy/response.
    """
    pan_f = jnp.asarray(pan_tiles).astype(jnp.float32)
    band_f = jnp.asarray(band_tiles).astype(jnp.float32)
    h, w = pan_tiles.shape[1:]
    if band_tiles.shape[1] * MSS_BANDS == h and band_tiles.shape[2] * MSS_BANDS == w:
        up = resample.upsample4_f32(band_f)
    else:
        up = resample.resize_cubic_f32(band_f, h, w)
    pan_rep = jnp.repeat(pan_f, bands, axis=0)
    dxs, dys, rss = phasecorr.phase_correlate_batch(pan_rep, up)
    return np.asarray(dxs), np.asarray(dys), np.asarray(rss)
