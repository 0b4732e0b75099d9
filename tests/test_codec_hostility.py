"""Cross-codec mutation hostility: every top-level parse entry point
the Arrow stages call must return a value or its documented None —
never raise — for ANY single-byte corruption of a valid fixture.

This is the sweep that caught the r11 zip zlib.error stage-failure
gap; pinned here so no decoder regresses to leaking parser
exceptions into Spark tasks. All local (no Spark session): the same
functions the mapInPandas stages invoke per payload.
"""

from __future__ import annotations

import numpy as np
import pytest

from flycatcher_spark.operators import bmp, flac, gif, jpeg, pdf, tiff, video
from flycatcher_spark.operators import multimodal as M
from flycatcher_spark.operators.webp import encode_webp


def _dc(v):
    return [v] + [0] * 63


def _payloads():
    jpg = jpeg.encode_jpeg(16, 16, [[_dc(5), _dc(3), _dc(2), _dc(1)]])
    return {
        "jpeg": (jpg, M.parse_image),
        "gif": (
            gif.encode_gif(
                10, 8, [int(x) for x in (np.arange(80) * 3) % 4],
                [(0, 0, 0), (80, 80, 80), (160, 160, 160), (240, 240, 240)],
            ),
            M.parse_image,
        ),
        "tiff": (
            tiff.encode_tiff(
                10, 8, [int(x) for x in (np.arange(240) * 7) % 256],
                compression="lzw",
            ),
            M.parse_image,
        ),
        "bmp": (
            bmp.encode_bmp(
                10, 8, [int(x) for x in (np.arange(240) * 7) % 256]
            ),
            M.parse_image,
        ),
        "webp": (encode_webp((np.arange(240) * 7) % 256, 10, 8, 3),
                 M.parse_image),
        "pdf": (
            pdf.encode_pdf(
                [["hello world", "line two"]],
                compress=True, xref_stream=True, objstm=True,
            ),
            pdf.parse_pdf,
        ),
        "avi": (video.make_avi_bytes([jpg] * 3, 16, 16),
                video.parse_avi_frames),
        "flac": (flac.encode_flac(list(range(-100, 100))), M.parse_audio),
        "png": (_png_bytes(), M.parse_image),
        "pnm": (_pnm_bytes(), M.parse_image),
        "wav": (_wav_bytes(), M.parse_audio),
    }


def _png_bytes():
    import struct
    import zlib

    def chunk(tag, body):
        return (
            struct.pack(">I", len(body))
            + tag + body
            + struct.pack(">I", zlib.crc32(tag + body))
        )

    w, h = 10, 8
    px = ((np.arange(w * h * 3) * 7) % 256).astype(np.uint8).reshape(h, -1)
    raw = b"".join(b"\x00" + row.tobytes() for row in px)
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


def _pnm_bytes():
    body = bytes(int(x) for x in (np.arange(10 * 8 * 3) * 7) % 256)
    return b"P6\n10 8\n255\n" + body


def _wav_bytes():
    import struct

    pcm = struct.pack("<100h", *[(i * 37) % 1000 - 500 for i in range(100)])
    fmt = struct.pack("<HHIIHH", 1, 1, 8000, 16000, 2, 16)
    body = (
        b"WAVE"
        + b"fmt " + struct.pack("<I", len(fmt)) + fmt
        + b"data" + struct.pack("<I", len(pcm)) + pcm
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


@pytest.mark.parametrize("name", list(_payloads()))
def test_single_byte_mutations_never_raise(name):
    base, fn = _payloads()[name]
    step = max(1, len(base) // 400)
    for p in range(0, len(base), step):
        for delta in (1, 128):
            mut = bytearray(base)
            mut[p] = (mut[p] + delta) % 256
            fn(bytes(mut))  # any return value is fine; raising is not


@pytest.mark.parametrize("name", list(_payloads()))
def test_truncations_never_raise(name):
    base, fn = _payloads()[name]
    step = max(1, len(base) // 100)
    for cut in range(0, len(base), step):
        fn(bytes(base[:cut]))


@pytest.mark.parametrize("name", list(_payloads()))
def test_sniffer_never_raises_and_terminates(name):
    # sniff_format runs over EVERY payload in format_stats — it must
    # classify (any label, or its documented None for null/empty)
    # without raising or spinning on crafted chunk sizes, for
    # mutations and truncations alike
    base, _ = _payloads()[name]
    step = max(1, len(base) // 200)
    for p in range(0, len(base), step):
        for delta in (1, 128):
            mut = bytearray(base)
            mut[p] = (mut[p] + delta) % 256
            assert isinstance(M.sniff_format(bytes(mut)), (str, type(None)))
    for cut in range(0, len(base), max(1, len(base) // 50)):
        assert isinstance(
            M.sniff_format(bytes(base[:cut])), (str, type(None))
        )
