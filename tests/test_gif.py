"""operators/gif — stdlib-only GIF decode (LZW, palettes, interlace)
and the real-compressor fixture encoder."""

from __future__ import annotations

import numpy as np

from flycatcher_spark.operators import multimodal
from flycatcher_spark.operators.gif import (
    _lzw_decode,
    _lzw_encode,
    encode_gif,
    parse_gif,
)

RNG = np.random.default_rng(31)

PAL4 = [(10, 0, 0), (0, 20, 0), (0, 0, 30), (40, 40, 40)]
PAL256 = [((i * 7) % 256, (i * 13) % 256, (i * 29) % 256)
          for i in range(256)]


def _rgb(indices, pal):
    return np.array([pal[i] for i in indices]).reshape(-1)


class TestLzw:
    def test_round_trips_across_sizes_and_code_widths(self):
        for mcs, n, hi in [(2, 1, 4), (2, 39, 4), (2, 5000, 4),
                           (8, 40000, 256), (4, 9000, 16)]:
            idx = list(RNG.integers(0, hi, size=n))
            assert _lzw_decode(_lzw_encode(idx, mcs), mcs, n) == idx

    def test_repetitive_data_deep_strings(self):
        # long runs drive deep table strings and the KwKwK case
        idx = [0] * 3000 + [1, 0] * 500 + [2] * 1000
        assert _lzw_decode(_lzw_encode(idx, 2), 2, len(idx)) == idx

    def test_table_reset_at_4096(self):
        # 40000 random bytes guarantee the table fills and the
        # encoder emits a mid-stream clear code
        idx = list(RNG.integers(0, 256, size=40000))
        enc = _lzw_encode(idx, 8)
        assert _lzw_decode(enc, 8, len(idx)) == idx

    def test_truncated_stream_raises(self):
        import pytest

        idx = list(RNG.integers(0, 4, size=100))
        enc = _lzw_encode(idx, 2)
        with pytest.raises(ValueError):
            _lzw_decode(enc[: len(enc) // 4], 2, 100)


class TestRoundTrip:
    def test_small_palette(self):
        idx = list(RNG.integers(0, 4, size=7 * 5))
        m = parse_gif(encode_gif(7, 5, idx, PAL4))
        assert (m["fmt"], m["width"], m["height"], m["n_channels"]) == (
            "gif", 7, 5, 3,
        )
        assert np.array_equal(np.array(m["pixels"]), _rgb(idx, PAL4))

    def test_full_256_palette_with_width_growth(self):
        idx = list(RNG.integers(0, 256, size=80 * 60))
        m = parse_gif(encode_gif(80, 60, idx, PAL256))
        assert np.array_equal(np.array(m["pixels"]), _rgb(idx, PAL256))

    def test_interlaced_rows_reordered(self):
        idx = list(RNG.integers(0, 4, size=13 * 11))
        plain = parse_gif(encode_gif(13, 11, idx, PAL4))
        inter = parse_gif(encode_gif(13, 11, idx, PAL4, interlaced=True))
        assert np.array_equal(
            np.array(inter["pixels"]), np.array(plain["pixels"])
        )

    def test_animated_reports_frames_decodes_first(self):
        idx = list(range(4)) * 4
        m = parse_gif(encode_gif(4, 4, idx, PAL4, animated_copies=3))
        assert m["n_frames"] == 3
        assert np.array_equal(np.array(m["pixels"]), _rgb(idx, PAL4))

    def test_rejections(self):
        assert parse_gif(None) is None
        assert parse_gif(b"GIF89a") is None
        assert parse_gif(b"\x89PNG\r\n\x1a\n") is None
        b = encode_gif(7, 5, [0] * 35, PAL4)
        assert parse_gif(b[: len(b) // 2]) is None


class TestSparkIntegration:
    def test_mixed_image_corpus_dispatch(self, spark):
        docs = spark.createDataFrame([(i,) for i in range(8)], "doc_id long")
        pnm = multimodal.make_pnm_payload(docs.where("doc_id % 4 = 0"))
        png = multimodal.make_png_payload(docs.where("doc_id % 4 = 1"))
        jpg = multimodal.make_jpeg_payload(docs.where("doc_id % 4 = 2"))
        gif = multimodal.make_gif_payload(docs.where("doc_id % 4 = 3"))
        corpus = pnm.unionByName(png).unionByName(jpg).unionByName(gif)
        out = {
            r.doc_id: r.fmt
            for r in multimodal.decode_image_meta(corpus).collect()
        }
        assert out[3] == "gif" and out[7] == "gif"
        assert out[1] == "png" and out[2] == "jpeg"

    def test_fixture_closed_form(self, spark):
        import pytest

        docs = spark.createDataFrame([(i,) for i in range(12)], "doc_id long")
        meta = multimodal.decode_image_meta(
            multimodal.make_gif_payload(docs)
        ).collect()
        for r in meta:
            i = r.doc_id
            w, h = 4 + i % 13, 3 + i % 7
            assert (r.width, r.height, r.n_channels) == (w, h, 3)
            js = [(i * 5 + k * 11) % 8 for k in range(w * h)]
            mean = sum(
                (j * 37) % 256 + (j * 59) % 256 + (j * 83) % 256 for j in js
            ) / (3 * w * h)
            assert r.mean_pixel == pytest.approx(mean, abs=1e-9)

    def test_sniffer_labels_gif(self, spark):
        docs = spark.createDataFrame([(1,)], "doc_id long")
        row = multimodal.payload_format(
            multimodal.make_gif_payload(docs)
        ).first()
        assert row.payload_fmt == "gif"
