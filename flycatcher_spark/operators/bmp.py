"""BMP (Windows DIB) decoding with the standard library only — the
sixth real image format behind :func:`multimodal.parse_image`'s
magic-byte dispatch (``sniff_format`` has labeled ``bmp`` payloads
since r8; now they decode).

Scope (documented subset, honest about what it is):

- ``BM`` file header + the 40-byte BITMAPINFOHEADER (the form the
  overwhelming majority of real files use); positive height =
  bottom-up row order, negative = top-down;
- 24-bit BI_RGB (BGR triples, rows padded to 4 bytes), 8-bit
  palettized BI_RGB, and 8-bit BI_RLE8 — real run-length decoding
  with all four escapes (end-of-line, end-of-bitmap, delta skip,
  absolute mode with word alignment); delta-skipped pixels take
  palette index 0 (the spec leaves them undefined; this is the
  deterministic reading);
- anything else (1/4/16/32 bpp, BI_RLE4, BITFIELDS, V4/V5 headers)
  returns ``None`` honestly.

The fixture encoder (:func:`encode_bmp`) is a real writer — correct
header sizes and offsets, 4-byte row padding, bottom-up/top-down,
and a genuine RLE8 compressor (encoded runs for repeats >= 3,
absolute mode for literal stretches, per-row end-of-line escapes) —
so round-trip tests pin real decoding.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = ["parse_bmp", "encode_bmp"]


def _decode_rle8(data: bytes, width: int, height: int) -> np.ndarray:
    """BI_RLE8 → index grid (top-down row order in the returned
    array; the caller handles bottom-up flipping)."""
    grid = np.zeros((height, width), dtype=np.int64)
    x = y = 0
    pos = 0
    n = len(data)
    while pos + 1 < n:
        count, val = data[pos], data[pos + 1]
        pos += 2
        if count > 0:  # encoded run
            if y >= height or x + count > width:
                raise ValueError("RLE8 run overflows row")
            grid[y, x : x + count] = val
            x += count
            continue
        if val == 0:  # end of line
            x, y = 0, y + 1
            continue
        if val == 1:  # end of bitmap
            return grid
        if val == 2:  # delta: skip (dx, dy); skipped pixels stay 0
            if pos + 1 >= n:
                raise ValueError("RLE8 delta truncated")
            x += data[pos]
            y += data[pos + 1]
            pos += 2
            if x > width or y > height:
                raise ValueError("RLE8 delta out of bounds")
            continue
        # absolute mode: val literal indices, padded to a word
        if y >= height or x + val > width or pos + val > n:
            raise ValueError("RLE8 absolute overflows")
        grid[y, x : x + val] = np.frombuffer(
            data, dtype=np.uint8, count=val, offset=pos
        )
        x += val
        pos += val + (val & 1)  # word alignment
    return grid


def parse_bmp(payload: bytes) -> dict | None:
    """Decode a BMP payload. Returns the :func:`multimodal.parse_png`
    dict shape — ``fmt`` (``"bmp"``), ``width``/``height``,
    ``maxval`` (255), ``n_channels`` (3 — palettes expand, BGR
    reorders to RGB), ``pixels`` — or ``None`` for non-BMP / corrupt
    / out-of-subset payloads.

    Examples
    --------
        >>> body = encode_bmp(2, 1, [1, 2, 3, 9, 8, 7])
        >>> m = parse_bmp(body)
        >>> (m["fmt"], m["width"], list(m["pixels"]))
        ('bmp', 2, [1, 2, 3, 9, 8, 7])
        >>> parse_bmp(b"GIF89a...") is None
        True
    """
    if payload is None:
        return None
    try:
        buf = bytes(payload)
        if len(buf) < 54 or buf[:2] != b"BM":
            return None
        data_off = struct.unpack("<I", buf[10:14])[0]
        hdr_size = struct.unpack("<I", buf[14:18])[0]
        if hdr_size != 40:  # BITMAPINFOHEADER only
            return None
        width, height_raw = struct.unpack("<ii", buf[18:26])
        planes, bpp = struct.unpack("<HH", buf[26:30])
        compression = struct.unpack("<I", buf[30:34])[0]
        n_colors = struct.unpack("<I", buf[46:50])[0]
        if width <= 0 or height_raw == 0 or planes != 1:
            return None
        top_down = height_raw < 0
        height = abs(height_raw)
        if (bpp, compression) not in ((24, 0), (8, 0), (8, 1)):
            return None
        if bpp == 8:
            n_pal = n_colors or 256
            pal_off = 14 + hdr_size
            raw_pal = np.frombuffer(
                buf, dtype=np.uint8, count=4 * n_pal, offset=pal_off
            ).reshape(-1, 4)
            pal = raw_pal[:, [2, 1, 0]].astype(np.int64)  # BGRX -> RGB
            if compression == 1:
                idx = _decode_rle8(buf[data_off:], width, height)
                # RLE streams are stored bottom-up like BI_RGB
                if not top_down:
                    idx = idx[::-1]
            else:
                row_bytes = (width + 3) & ~3
                need = row_bytes * height
                raw = np.frombuffer(
                    buf, dtype=np.uint8, count=need, offset=data_off
                ).reshape(height, row_bytes)[:, :width]
                idx = raw.astype(np.int64)
                if not top_down:
                    idx = idx[::-1]
            if int(idx.max(initial=0)) >= pal.shape[0]:
                return None
            flat = pal[idx.reshape(-1)].reshape(-1)
        else:
            row_bytes = (width * 3 + 3) & ~3
            need = row_bytes * height
            raw = np.frombuffer(
                buf, dtype=np.uint8, count=need, offset=data_off
            ).reshape(height, row_bytes)[:, : width * 3]
            rows = raw.reshape(height, width, 3)[:, :, ::-1]  # BGR->RGB
            if not top_down:
                rows = rows[::-1]
            flat = rows.astype(np.int64).reshape(-1)
        return {
            "fmt": "bmp",
            "width": int(width),
            "height": int(height),
            "maxval": 255,
            "n_channels": 3,
            "pixels": flat,
        }
    except (IndexError, ValueError, struct.error):
        return None


def _encode_rle8(idx: np.ndarray) -> bytes:
    """Real RLE8 compressor: encoded runs for repeats >= 3, absolute
    mode for literal stretches of >= 3, tiny leftovers as 1-2 pixel
    encoded runs; end-of-line after each row, end-of-bitmap last."""
    out = bytearray()
    height, width = idx.shape
    for y in range(height):
        row = idx[y]
        x = 0
        while x < width:
            run = 1
            while (
                x + run < width and run < 255 and row[x + run] == row[x]
            ):
                run += 1
            if run >= 3:
                out += bytes([run, int(row[x])])
                x += run
                continue
            # literal stretch until the next >=3 run (or 255 cap)
            k = x
            while k < width and k - x < 255:
                if (
                    k + 2 < width
                    and row[k] == row[k + 1] == row[k + 2]
                ):
                    break
                k += 1
            n_lit = k - x
            if n_lit >= 3:
                out += bytes([0, n_lit]) + bytes(
                    int(v) for v in row[x:k]
                )
                if n_lit & 1:
                    out += b"\x00"  # word alignment
                x = k
            else:
                for j in range(n_lit):
                    out += bytes([1, int(row[x + j])])
                x = k
        out += b"\x00\x00"  # end of line
    out += b"\x00\x01"  # end of bitmap
    return bytes(out)


def encode_bmp(
    width: int,
    height: int,
    pixels,
    bpp: int = 24,
    palette: list[tuple[int, int, int]] | None = None,
    rle: bool = False,
    top_down: bool = False,
) -> bytes:
    """Spec-conformant BMP writer (fixture/oracle generator):
    BITMAPFILEHEADER + BITMAPINFOHEADER, 4-byte-padded bottom-up (or
    ``top_down``) rows for BI_RGB, BGRX palette entries for 8-bit,
    and a genuine RLE8 compressor for ``rle=True`` (8-bit bottom-up
    only, as the format requires). ``pixels`` is row-major TOP-DOWN
    RGB (or palette indices for 8-bit)."""
    if bpp not in (8, 24):
        raise ValueError("bpp subset is 8 or 24")
    if bpp == 8 and palette is None:
        raise ValueError("8-bit BMP needs a palette")
    if rle and (bpp != 8 or top_down):
        raise ValueError("RLE8 is 8-bit bottom-up only")
    spp = 3 if bpp == 24 else 1
    px = [int(v) for v in pixels]
    if len(px) != width * height * spp:
        raise ValueError("pixels must be width*height*samples")
    arr = np.array(px, dtype=np.int64).reshape(height, width, spp)

    pal_bytes = b""
    n_pal = 0
    if bpp == 8:
        n_pal = max(len(palette), 1)
        if n_pal > 256:
            raise ValueError("palette too large")
        pal_bytes = b"".join(
            bytes([b, g, r, 0]) for r, g, b in palette
        )
    if rle:
        idx = arr[:, :, 0][::-1]  # RLE streams store rows bottom-up
        body = _encode_rle8(idx)
        compression = 1
    else:
        rows = arr if top_down else arr[::-1]
        if bpp == 24:
            rows = rows[:, :, ::-1]  # RGB -> BGR
        row_bytes = (width * spp + 3) & ~3
        body = bytearray()
        for r in rows:
            line = r.astype(np.uint8).tobytes()
            body += line + b"\x00" * (row_bytes - len(line))
        body = bytes(body)
        compression = 0
    data_off = 14 + 40 + len(pal_bytes)
    out = bytearray()
    out += b"BM"
    out += struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
    out += struct.pack(
        "<IiiHHIIiiII",
        40,
        width,
        -height if top_down else height,
        1,
        bpp,
        compression,
        len(body),
        2835,
        2835,
        n_pal,
        0,
    )
    out += pal_bytes + body
    return bytes(out)
