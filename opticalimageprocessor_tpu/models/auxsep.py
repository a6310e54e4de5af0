"""Downlink AUX/image separation (reference ``AuxSeparator``,
aux_separator.h:190-748).

Pipeline parity (SURVEY §3.4) with a vectorised host runtime instead of the
reference's two-thread byte-at-a-time loop:

1. AOS scan: memory-map the downlink file, find every sync marker
   (native memmem sweep), validate VCID/injection/CRC-16 in batch, and walk
   the cursor with the reference's advance rules (valid -> +1024 bytes,
   invalid/empty -> +4).
2. IMTR reassembly: concatenate the 880-byte payloads, cut 882-byte
   image-transfer frames (no resync), validate signatures + CRC, warn on
   sequence gaps, and write the 866-byte payloads to the `.IMDT`
   intermediate file (named station_satellite_CMOS-n_date_time.IMDT).
3. Image-data separation: scan the IMDT byte stream for image-frame
   signatures (the frame *data precedes* the signature), zero-fill missing
   sequence numbers to keep raster geometry, split each frame into the
   48 KB aux block + 40 sub-image tiles (32 PAN + 8 MSS), inflate
   (raw copy or JPEG2000 decode), byte-swap to little-endian, and merge to
   `.AUX`, `.PAN.RAW`, `.MSS.RAW`.

JPEG2000 tiles decode through OpenCV when available (the same codec the
reference uses, aux_separator.h:383); uncompressed frames need no codec.
"""

from __future__ import annotations

import os
from dataclasses import dataclass

import numpy as np

from ..constants import AUX_FILE_EXT, RAW_FILE_EXT, STEM_EXT_MSS, STEM_EXT_PAN
from ..formats import aos
from ..formats.naming import (
    AosFileInfo,
    build_output_file_path,
    imdt_file_name,
    parse_aos_file_info,
)
from ..utils import native
from ..utils.logging import logw, olog, stage

BYTES_PER_PANLINE = 12288 * 2


def _decode_jp2(codestream: bytes) -> np.ndarray:
    try:
        import cv2
    except ImportError as e:
        raise RuntimeError(
            "JPEG2000 sub-image decoding requires OpenCV (cv2); "
            "uncompressed downlinks work without it"
        ) from e
    arr = np.frombuffer(codestream, dtype=np.uint8)
    img = cv2.imdecode(arr, cv2.IMREAD_UNCHANGED)
    if img is None:
        raise ValueError("JPEG2000 decode failed")
    return img.astype(np.uint16)


@dataclass
class AuxSeparator:
    input_file: str
    offset: int = 0
    out_dir: str | None = None

    def __post_init__(self):
        self.is_imdt = self.input_file.upper().endswith(".IMDT")
        self.imdt_file = self.input_file if self.is_imdt else ""
        self.afi = AosFileInfo()
        if not self.is_imdt:
            name = os.path.basename(self.input_file)
            afi = parse_aos_file_info(name)
            if afi is None:
                afi = parse_aos_file_info(
                    os.path.basename(os.path.dirname(self.input_file))
                )
            if afi is None:
                raise ValueError("unrecognized AOS file name pattern")
            self.afi = afi
        # page-align the start offset like the reference (aux_separator.h:197-201)
        page = 4096
        if self.offset % page != 0:
            adjusted = self.offset // page * page
            logw(
                "offset not aligned with system memory page size, adjusted "
                "to %d (0x%X).", adjusted, adjusted,
            )
            self.offset = adjusted

    # ------------------------------------------------------------------
    def separate(self) -> dict[str, str]:
        """Run the full separation; returns the output file paths."""
        if not self.is_imdt:
            self._separate_aos()
        return self._separate_image_data()

    # -- stages 1+2 -----------------------------------------------------
    def _separate_aos(self):
        # materialise in RAM once: the scan's random-access gathers are far
        # cheaper against anonymous memory than against a page-faulting mmap
        with stage("aos_read", 0):
            buf = np.fromfile(self.input_file, dtype=np.uint8, offset=self.offset)
        with stage("aos_scan", buf.nbytes):
            res = aos.scan_aos_frames(buf)
        olog(
            "AOS frames: %d valid, %d empty, %d invalid.",
            res.valid.size, res.empty.size, res.invalid.size,
        )
        payloads = aos.extract_aos_payloads(buf, res.valid)
        stream = payloads.reshape(-1)
        with stage("imtr_parse", stream.nbytes):
            imtr = aos.parse_imtr_stream(stream)
        for lo, hi in imtr.missing_ranges:
            logw("missing or invalid image transfer frame(s) #%08d-%08d", lo, hi)
        if imtr.payload.shape[0] == 0:
            raise RuntimeError("no valid image transfer frames found")
        self.imdt_file = os.path.join(
            self.out_dir or os.getcwd(),
            imdt_file_name(self.afi, imtr.chid == aos.IMTR_CHID_CMOS1),
        )
        with stage("imdt_write", imtr.payload.nbytes):
            imtr.payload.tofile(self.imdt_file)
        olog("%d frames parsed & written -> %s", imtr.payload.shape[0], self.imdt_file)

    # -- stage 3 --------------------------------------------------------
    def _separate_image_data(self) -> dict[str, str]:
        sz = os.stat(self.imdt_file).st_size
        aux_path = build_output_file_path(
            self.imdt_file, "", AUX_FILE_EXT, out_dir=self.out_dir
        )
        pan_path = build_output_file_path(
            self.imdt_file, STEM_EXT_PAN, RAW_FILE_EXT, out_dir=self.out_dir
        )
        mss_path = build_output_file_path(
            self.imdt_file, STEM_EXT_MSS, RAW_FILE_EXT, out_dir=self.out_dir
        )
        buf = np.fromfile(self.imdt_file, dtype=np.uint8)

        zero_aux = bytes(aos.IMGSIG_AUX_ALLBYTES)
        zero_pan = bytes(BYTES_PER_PANLINE * aos.IMGSIG_PAN_LINES)
        zero_mss = bytes(BYTES_PER_PANLINE * aos.IMGSIG_MSS_LINES)

        sigs = native.find_signatures(buf, aos.IMGSIG_SIG)
        last_seq = 0
        n_frames = 0
        with (
            open(aux_path, "wb") as f_aux,
            open(pan_path, "wb") as f_pan,
            open(mss_path, "wb") as f_mss,
            stage("imdt_extract", sz),
        ):
            cursor = 0
            for sp in sigs.tolist():
                if sp < cursor:
                    continue
                if sp + aos.IMGSIG_META_BYTES > buf.shape[0]:
                    break
                meta = aos.parse_image_frame_meta(buf, sp)
                if meta.start < cursor:
                    # incomplete frame: data would begin before the cursor
                    olog("incomplete image frame #%05d, ignored.", meta.seq)
                    cursor = meta.frame_end
                    continue
                if meta.seq > last_seq + 1:
                    olog(
                        "Missing image frame(s) of range[%06d,%06d], "
                        "filling with zero data ...", last_seq + 1, meta.seq - 1,
                    )
                    for _ in range(meta.seq - last_seq - 1):
                        f_aux.write(zero_aux)
                        f_pan.write(zero_pan)
                        f_mss.write(zero_mss)
                self._write_frame(buf, meta, f_aux, f_pan, f_mss)
                cursor = meta.frame_end
                last_seq = meta.seq
                n_frames += 1
        olog("%d image frames processed.", n_frames)
        return {"aux": aux_path, "pan": pan_path, "mss": mss_path}

    def _write_frame(self, buf, meta: aos.ImageFrameMeta, f_aux, f_pan, f_mss):
        start = meta.start
        f_aux.write(buf[start : start + aos.IMGSIG_AUX_ALLBYTES].tobytes())
        p = start + aos.IMGSIG_AUX_ALLBYTES

        n_vparts = aos.IMGSIG_PAN_VPARTS + aos.IMGSIG_MSS_VPARTS
        stripe = np.empty(
            (aos.IMGSIG_IMBASE_LINES, aos.IMGSIG_IMG_HPARTS * aos.IMGSIG_IMBASE_COLS),
            np.uint16,
        )
        for r in range(n_vparts):
            for c in range(aos.IMGSIG_IMG_HPARTS):
                idx = r * aos.IMGSIG_IMG_HPARTS + c
                nbytes = int(meta.sub_image_dwords[idx]) * 4
                tile = self._inflate_sub_image(
                    meta.z_ratio, buf[p : p + nbytes]
                )
                stripe[
                    :, c * aos.IMGSIG_IMBASE_COLS : (c + 1) * aos.IMGSIG_IMBASE_COLS
                ] = tile
                p += nbytes
            (f_pan if r < aos.IMGSIG_PAN_VPARTS else f_mss).write(
                np.ascontiguousarray(stripe, dtype="<u2").tobytes()
            )

    def _inflate_sub_image(self, z_ratio: int, block: np.ndarray) -> np.ndarray:
        shape = (aos.IMGSIG_IMBASE_LINES, aos.IMGSIG_IMBASE_COLS)
        if z_ratio == aos.IMGSIG_ZRTO_NONE:
            tile = np.frombuffer(block.tobytes(), dtype=np.uint16).reshape(shape)
            tile = tile.copy()
        else:
            zih = aos.parse_z_image_header(block)
            code = block[aos.Z_ZDATA_OFF : aos.Z_ZDATA_OFF + zih.data_dwords * 4]
            tile = _decode_jp2(code.tobytes()).reshape(shape)
        # unconditional big->little byte swap (aux_separator.h:387-392)
        return native.byteswap16(np.ascontiguousarray(tile, dtype=np.uint16))
