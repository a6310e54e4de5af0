"""Host->device section streaming: halos, coverage, end-to-end equivalence."""

import jax.numpy as jnp
import numpy as np

from opticalimageprocessor_tpu.io import raw as raw_io
from opticalimageprocessor_tpu.io.streaming import SectionStreamer, stream_process


def _make_strip(tmp_path, rng, lines=100, width=64):
    img = rng.integers(0, 65536, (lines, width), dtype=np.uint16)
    p = str(tmp_path / "s.RAW")
    img.astype("<u2").tofile(p)
    return img, raw_io.RawStrip(p, width)


def test_sections_cover_strip_with_halos(tmp_path, rng):
    img, strip = _make_strip(tmp_path, rng)
    secs = list(SectionStreamer(strip, section_lines=32, halo=4))
    assert [s.line_offset for s in secs] == [0, 32, 64, 96]
    assert [s.lines for s in secs] == [32, 32, 32, 4]
    assert secs[0].halo_top == 0 and secs[0].halo_bottom == 4
    assert secs[1].halo_top == 4 and secs[1].halo_bottom == 4
    assert secs[-1].halo_bottom == 0
    for s in secs:
        want = img[
            s.line_offset - s.halo_top : s.line_offset + s.lines + s.halo_bottom
        ]
        np.testing.assert_array_equal(np.asarray(s.data), want)


def test_stream_process_equals_whole_strip(tmp_path, rng):
    img, strip = _make_strip(tmp_path, rng, lines=123)
    # a halo-using op: 3-row mean (same result sectioned vs whole)
    halo = 1

    def fn(sec):
        x = sec.data.astype(jnp.float32)
        pad_t = 1 - sec.halo_top
        pad_b = 1 - sec.halo_bottom
        x = jnp.pad(x, ((pad_t, pad_b), (0, 0)), mode="edge")
        out = (x[:-2] + x[1:-1] + x[2:]) / 3.0
        return out

    chunks = []
    n = stream_process(strip, fn, chunks.append, section_lines=32, halo=halo)
    got = np.concatenate(chunks)
    assert n == 123

    w = np.pad(img.astype(np.float32), ((1, 1), (0, 0)), mode="edge")
    want = (w[:-2] + w[1:-1] + w[2:]) / 3.0
    np.testing.assert_allclose(got, want, rtol=1e-6)
