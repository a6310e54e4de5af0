"""Foreign-TIFF interop: rasters written by OTHER tools must be readable.

The reference stitches any OpenCV/GDAL-readable TIFF (cv::imread at
imageop.h:418-420; sectioned RasterIO at imageop.h:489-558).  Our reader
therefore accepts, beyond its own write dialect: deflate / Adobe-deflate /
PackBits compression, PlanarConfiguration=2, tiled layout, and big-endian
byte order.  Fixtures come from cv2.imwrite (real libtiff output) and a
minimal hand-rolled tiled writer (cv2 cannot write tiles).
"""

import struct
import zlib

import numpy as np
import pytest

from opticalimageprocessor_tpu.io import tiff as tiff_io

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None

needs_cv2 = pytest.mark.skipif(cv2 is None, reason="cv2 unavailable")


# ---------------------------------------------------------------------------
# Minimal tiled-TIFF writer (test fixture only)
# ---------------------------------------------------------------------------

def write_tiled_tiff(
    path,
    img,
    tile=(32, 32),
    planar=1,
    compression=tiff_io.COMPRESSION_NONE,
    big_endian=False,
):
    """Write (H, W, S) uint16 as a classic TIFF with tiled layout."""
    e = ">" if big_endian else "<"
    h, w, s = img.shape
    tl, tw = tile
    tiles_y = -(-h // tl)
    tiles_x = -(-w // tw)
    dt = ">u2" if big_endian else "<u2"

    def tile_bytes(data):
        raw = np.ascontiguousarray(data).astype(dt).tobytes()
        if compression in (
            tiff_io.COMPRESSION_DEFLATE,
            tiff_io.COMPRESSION_ADOBE_DEFLATE,
        ):
            return zlib.compress(raw)
        return raw

    with open(path, "wb") as f:
        f.write(struct.pack(e + "2sHI", b"MM" if big_endian else b"II", 42, 0))
        offsets, counts = [], []
        planes = s if planar == 2 else 1
        spp_tile = 1 if planar == 2 else s
        for p in range(planes):
            for ty in range(tiles_y):
                for tx in range(tiles_x):
                    pad = np.zeros((tl, tw, spp_tile), np.uint16)
                    rows = min(tl, h - ty * tl)
                    cols = min(tw, w - tx * tw)
                    src = img[ty * tl : ty * tl + rows, tx * tw : tx * tw + cols]
                    pad[:rows, :cols] = src[:, :, p : p + 1] if planar == 2 else src
                    data = tile_bytes(pad)
                    offsets.append(f.tell())
                    counts.append(len(data))
                    f.write(data)

        def arr_or_inline(values, typ):
            fmt, size = {3: ("H", 2), 4: ("I", 4)}[typ]
            raw = struct.pack(e + f"{len(values)}{fmt}", *values)
            if len(raw) <= 4:
                pad_raw = raw.ljust(4, b"\x00")
                (v,) = struct.unpack(e + "I", pad_raw)
                return v
            pos = f.tell()
            f.write(raw)
            return pos

        entries = [
            (256, 4, [w]),
            (257, 4, [h]),
            (258, 3, [16] * s),
            (259, 3, [compression]),
            (262, 3, [2 if s >= 3 else 1]),
            (277, 3, [s]),
            (284, 3, [planar]),
            (322, 4, [tw]),
            (323, 4, [tl]),
            (324, 4, offsets),
            (325, 4, counts),
            (339, 3, [1] * s),
        ]
        packed = [
            (tag, typ, len(vals), arr_or_inline(vals, typ))
            for tag, typ, vals in entries
        ]
        ifd = f.tell()
        f.write(struct.pack(e + "H", len(packed)))
        for tag, typ, count, value in sorted(packed):
            f.write(struct.pack(e + "HHII", tag, typ, count, value))
        f.write(struct.pack(e + "I", 0))
        f.seek(4)
        f.write(struct.pack(e + "I", ifd))


# ---------------------------------------------------------------------------
# cv2-written strip dialects
# ---------------------------------------------------------------------------

CV2_CODES = [
    ("lzw", tiff_io.COMPRESSION_LZW),
    ("deflate", tiff_io.COMPRESSION_DEFLATE),
    ("adobe_deflate", tiff_io.COMPRESSION_ADOBE_DEFLATE),
    ("packbits", tiff_io.COMPRESSION_PACKBITS),
    ("none", tiff_io.COMPRESSION_NONE),
]


@needs_cv2
@pytest.mark.parametrize("name,code", CV2_CODES)
def test_read_cv2_4band(tmp_path, rng, name, code):
    img = rng.integers(0, 65535, (70, 53, 4), np.uint16).astype(np.uint16)
    p = str(tmp_path / f"c4_{name}.tiff")
    assert cv2.imwrite(p, img, [cv2.IMWRITE_TIFF_COMPRESSION, code])
    info = tiff_io.read_tiff_info(p)
    assert info.compression == code
    got = tiff_io.read_tiff(p)
    # cv2 stores BGRA input as RGBA in the file
    np.testing.assert_array_equal(got[..., [2, 1, 0, 3]], img)


@needs_cv2
@pytest.mark.parametrize("name,code", CV2_CODES)
def test_read_cv2_single_band(tmp_path, rng, name, code):
    img = rng.integers(0, 65535, (70, 53), np.uint16).astype(np.uint16)
    p = str(tmp_path / f"c1_{name}.tiff")
    assert cv2.imwrite(p, img, [cv2.IMWRITE_TIFF_COMPRESSION, code])
    np.testing.assert_array_equal(tiff_io.read_tiff(p), img)


# ---------------------------------------------------------------------------
# Tiled / planar / big-endian
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("planar", [1, 2])
@pytest.mark.parametrize(
    "compression",
    [tiff_io.COMPRESSION_NONE, tiff_io.COMPRESSION_ADOBE_DEFLATE],
)
def test_read_tiled(tmp_path, rng, planar, compression):
    img = rng.integers(0, 65535, (70, 53, 4), np.uint16).astype(np.uint16)
    p = str(tmp_path / f"tiled_{planar}_{compression}.tiff")
    write_tiled_tiff(p, img, tile=(32, 16), planar=planar,
                     compression=compression)
    info = tiff_io.read_tiff_info(p)
    assert info.tile_width == 16 and info.tile_length == 32
    np.testing.assert_array_equal(tiff_io.read_tiff(p), img)


def test_read_tiled_big_endian(tmp_path, rng):
    img = rng.integers(0, 65535, (40, 40, 1), np.uint16).astype(np.uint16)
    p = str(tmp_path / "tiled_be.tiff")
    write_tiled_tiff(p, img, tile=(16, 16), big_endian=True)
    np.testing.assert_array_equal(tiff_io.read_tiff(p), img[:, :, 0])


def test_read_tiled_single_tile(tmp_path, rng):
    img = rng.integers(0, 65535, (20, 20, 1), np.uint16).astype(np.uint16)
    p = str(tmp_path / "tiled_one.tiff")
    write_tiled_tiff(p, img, tile=(32, 32))
    np.testing.assert_array_equal(tiff_io.read_tiff(p), img[:, :, 0])


def test_iter_rows_over_tiled(tmp_path, rng):
    img = rng.integers(0, 65535, (70, 53, 4), np.uint16).astype(np.uint16)
    p = str(tmp_path / "tiled_iter.tiff")
    write_tiled_tiff(p, img, tile=(32, 16))
    blocks = list(tiff_io.iter_tiff_rows(p, 17))
    assert all(b.shape[0] == 17 for b in blocks[:-1])
    np.testing.assert_array_equal(np.concatenate(blocks), img)


def test_packbits_decode_vectors():
    # TIFF 6.0 §9 worked example
    enc = bytes(
        [0xFE, 0xAA, 0x02, 0x80, 0x00, 0x2A, 0xFD, 0xAA, 0x03, 0x80, 0x00,
         0x2A, 0x22, 0xF7, 0xAA]
    )
    want = (
        b"\xaa\xaa\xaa\x80\x00\x2a\xaa\xaa\xaa\xaa\x80\x00\x2a\x22"
        + b"\xaa" * 10
    )
    assert tiff_io._packbits_decode(enc, len(want)) == want


def test_unsupported_compression_still_rejected(tmp_path, rng):
    img = rng.integers(0, 65535, (8, 8, 1), np.uint16).astype(np.uint16)
    p = str(tmp_path / "weird.tiff")
    write_tiled_tiff(p, img, tile=(8, 8), compression=7)  # JPEG
    with pytest.raises(ValueError, match="unsupported compression"):
        tiff_io.read_tiff(p)


# ---------------------------------------------------------------------------
# End-to-end: stitch consumes a cv2-written 4-band TIFF pair
# ---------------------------------------------------------------------------

@needs_cv2
def test_stitch_cv2_written_pair(tmp_path, rng):
    from opticalimageprocessor_tpu.models.stitcher import stitch

    h, w, fold = 64, 40, 8
    left = rng.integers(0, 65535, (h, w, 4), np.uint16).astype(np.uint16)
    right = rng.integers(0, 65535, (h, w, 4), np.uint16).astype(np.uint16)
    lp = str(tmp_path / "L.TIFF")
    rp = str(tmp_path / "R.TIFF")
    assert cv2.imwrite(lp, left, [cv2.IMWRITE_TIFF_COMPRESSION, 32946])
    assert cv2.imwrite(rp, right, [cv2.IMWRITE_TIFF_COMPRESSION, 32773])
    out = str(tmp_path / "out.TIFF")
    stitch(lp, rp, out, fold, use_gdal_style=True)
    got = tiff_io.read_tiff(out)
    assert got.shape == (h, 2 * (w - fold), 4)
    # the stitcher concatenates left[:, :-fold] | right[:, fold:] in FILE
    # band order (RGBA, since cv2 swapped on write)
    np.testing.assert_array_equal(
        got[:, : w - fold], left[:, : w - fold][..., [2, 1, 0, 3]]
    )
    np.testing.assert_array_equal(
        got[:, w - fold :], right[:, fold:][..., [2, 1, 0, 3]]
    )


def test_shell_drain_byte_identical_to_sequential_writer(tmp_path, rng):
    """create_tiff_shell + seek-writes must produce the exact bytes of the
    sequential TiffStripWriter: the sharded align drains route single- and
    multi-host runs through the shell path, and the sharded-vs-single
    byte-equality gates depend on the layouts agreeing."""
    from opticalimageprocessor_tpu.io.tiff import (
        TiffStripWriter,
        create_tiff_shell,
        tiff_data_start,
    )

    for h, w, s in [(1037, 223, 4), (64, 31, 1)]:
        arr = rng.integers(0, 65535, (h, w, s), dtype=np.uint16)
        a_path = str(tmp_path / f"seq_{s}.tif")
        b_path = str(tmp_path / f"shell_{s}.tif")
        wtr = TiffStripWriter(a_path, w, h, samples=s)
        wtr.write_rows(arr)
        wtr.close()
        ds = create_tiff_shell(b_path, w, h, s)
        assert ds == tiff_data_start(w, h, s)
        with open(b_path, "r+b") as f:
            f.seek(ds)
            f.write(np.ascontiguousarray(arr, "<u2").tobytes())
        with open(a_path, "rb") as fa, open(b_path, "rb") as fb:
            assert fa.read() == fb.read()
