"""operators/bmp — BMP (BITMAPINFOHEADER) decode: 24-bit BI_RGB,
8-bit palettized, real RLE8 with all four escapes."""

from __future__ import annotations

import pytest

from flycatcher_spark.operators import multimodal
from flycatcher_spark.operators.bmp import (
    _decode_rle8,
    encode_bmp,
    parse_bmp,
)

PAL8 = [((j * 37) % 256, (j * 59) % 256, (j * 83) % 256)
        for j in range(8)]


class TestRoundTrip:
    W, H = 9, 5  # width*3 = 27 -> rows pad to 28: padding exercised
    RGB = [(i * 7) % 256 for i in range(135)]
    IDX = [(i * 3) % 8 for i in range(45)]

    @pytest.mark.parametrize("top_down", [False, True])
    def test_truecolor_both_row_orders(self, top_down):
        m = parse_bmp(encode_bmp(self.W, self.H, self.RGB,
                                 top_down=top_down))
        assert (m["fmt"], m["width"], m["height"]) == ("bmp", 9, 5)
        assert list(m["pixels"]) == self.RGB

    @pytest.mark.parametrize("top_down", [False, True])
    def test_palettized(self, top_down):
        m = parse_bmp(encode_bmp(self.W, self.H, self.IDX, bpp=8,
                                 palette=PAL8, top_down=top_down))
        assert m["n_channels"] == 3
        assert list(m["pixels"]) == [
            v for i in self.IDX for v in PAL8[i]
        ]

    def test_rle8_with_real_runs(self):
        idx = [(k // 4) % 8 for k in range(45)]  # genuine runs
        m = parse_bmp(encode_bmp(self.W, self.H, idx, bpp=8,
                                 palette=PAL8, rle=True))
        assert list(m["pixels"]) == [v for i in idx for v in PAL8[i]]

    def test_rle8_literal_heavy(self):
        idx = [(k * 3 + 1) % 8 for k in range(45)]  # no runs at all
        m = parse_bmp(encode_bmp(self.W, self.H, idx, bpp=8,
                                 palette=PAL8, rle=True))
        assert list(m["pixels"]) == [v for i in idx for v in PAL8[i]]


class TestRle8Escapes:
    def test_hand_built_stream_all_escapes(self):
        stream = bytes([
            3, 2,              # run: 3 pixels of index 2
            0, 3, 4, 5, 6, 0,  # absolute: 3 literals + word pad
            0, 2, 1, 1,        # delta: skip dx=1, dy=1
            1, 7,              # run of 1
            0, 0,              # end of line
            0, 1,              # end of bitmap
        ])
        grid = _decode_rle8(stream, 8, 3)
        assert grid[0].tolist() == [2, 2, 2, 4, 5, 6, 0, 0]
        assert grid[1].tolist() == [0, 0, 0, 0, 0, 0, 0, 7]
        assert grid[2].tolist() == [0] * 8  # untouched -> index 0

    def test_overflow_raises(self):
        with pytest.raises(ValueError):
            _decode_rle8(bytes([9, 1, 0, 1]), 8, 1)


class TestHonestNone:
    def test_rejections(self):
        assert parse_bmp(None) is None
        assert parse_bmp(b"") is None
        assert parse_bmp(b"not a bmp") is None
        body = bytearray(encode_bmp(4, 2, [0] * 24))
        body[14] = 108  # BITMAPV4HEADER size: out of subset
        assert parse_bmp(bytes(body)) is None
        body = bytearray(encode_bmp(4, 2, [0] * 24))
        body[28] = 16  # 16 bpp: out of subset
        assert parse_bmp(bytes(body)) is None

    def test_writer_guards(self):
        with pytest.raises(ValueError, match="palette"):
            encode_bmp(2, 1, [0, 1], bpp=8)
        with pytest.raises(ValueError, match="RLE8"):
            encode_bmp(2, 1, [0, 1, 2, 3, 4, 5], rle=True)


class TestSparkIntegration:
    def test_fixture_closed_form(self, spark):
        docs = spark.createDataFrame(
            [(i,) for i in range(20)], "doc_id long"
        )
        meta = multimodal.decode_image_meta(
            multimodal.make_bmp_payload(docs)
        ).collect()
        assert len(meta) == 20
        for r in meta:
            i = r.doc_id
            w, h = 4 + i % 13, 3 + i % 7
            assert (r.fmt, r.n_channels) == ("bmp", 3)
            if i % 3 == 0:
                want = sum(
                    (i * 7 + k * 13) % 256 for k in range(3 * w * h)
                ) / (3 * w * h)
            elif i % 3 == 1:
                want = sum(
                    sum(PAL8[(i * 5 + k * 11) % 8])
                    for k in range(w * h)
                ) / (3 * w * h)
            else:
                want = sum(
                    sum(PAL8[(k // 4 + i) % 8]) for k in range(w * h)
                ) / (3 * w * h)
            assert r.mean_pixel == pytest.approx(want, abs=1e-9)

    def test_sniffer_labels_bmp(self, spark):
        assert multimodal.sniff_format(
            encode_bmp(2, 1, [1, 2, 3, 4, 5, 6])) == "bmp"
