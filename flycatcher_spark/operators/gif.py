"""GIF (87a/89a) static-image decoding with the standard library
only — the fourth real image format after PNM/PNG/JPEG
(:func:`multimodal.parse_image` dispatches all four), because GIFs
remain a meaningful share of any web crawl.

Scope (documented subset, honest about what it is):

- header + logical screen descriptor, global and local color tables;
- extension blocks skipped structurally (sub-block walk), including
  Graphic Control Extensions — transparency and disposal are
  animation concerns; this decoder returns the FIRST image frame
  expanded through its palette (``n_frames`` reports how many image
  descriptors the file holds, so a pipeline can SEE animation);
- full LZW decompression: variable code width (LSB-first packing),
  clear/end codes, table growth to 12 bits, the deferred-clear case;
- both row orders: sequential and the 4-pass GIF interlace.

The fixture encoder (:func:`encode_gif`) is a real LZW compressor
(greedy longest-match string table, the standard algorithm), so
pytest pins exact round-trips through genuine compression — table
growth, width bumps and clear-code resets included — and the
``gif_decode`` oracle states pixel statistics in closed form while
the decoder genuinely inflates its way there.

Runs inside the same Arrow ``mapInPandas`` stage as the other
decoders: payloads never shuffle, corrupt payloads yield null rows.
"""

from __future__ import annotations

import numpy as np

__all__ = ["parse_gif", "encode_gif"]


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> list[int]:
    """GIF-flavor LZW: codes packed LSB-first, initial width
    ``min_code_size + 1``, clear code ``2^mcs``, end-of-information
    ``2^mcs + 1``; the table grows by one entry per code consumed and
    the width bumps when the NEXT code would overflow it (capped at
    12 bits; further growth waits for a clear)."""
    clear = 1 << min_code_size
    end = clear + 1

    def fresh_table() -> list[list[int] | None]:
        return [[i] for i in range(clear)] + [None, None]

    table = fresh_table()
    width = min_code_size + 1
    out: list[int] = []
    prev: list[int] | None = None
    acc = 0
    nbits = 0
    pos = 0
    while len(out) < n_pixels:
        while nbits < width:
            if pos >= len(data):
                raise ValueError("LZW stream truncated")
            acc |= data[pos] << nbits
            nbits += 8
            pos += 1
        code = acc & ((1 << width) - 1)
        acc >>= width
        nbits -= width
        if code == clear:
            table = fresh_table()
            width = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table) and table[code] is not None:
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + [prev[0]]  # the KwKwK case
        else:
            raise ValueError("bad LZW code")
        out.extend(entry)
        if prev is not None:
            if len(table) < 4096:
                table.append(prev + [entry[0]])
        prev = entry
        if len(table) == (1 << width) and width < 12:
            width += 1
    return out[:n_pixels]


_INTERLACE_PASSES = [(0, 8), (4, 8), (2, 4), (1, 2)]


def parse_gif(payload: bytes) -> dict | None:
    """Decode a GIF payload's first frame. Returns the
    :func:`multimodal.parse_png` dict shape — ``fmt`` (``"gif"``),
    ``width``/``height`` (of the first frame), ``maxval`` (255),
    ``n_channels`` (3 — palette expanded to RGB), ``pixels``, plus
    ``n_frames`` (image descriptors in the file; >1 = animated) —
    or ``None`` for non-GIF / corrupt / out-of-subset payloads.

    Examples
    --------
        >>> body = encode_gif(2, 1, [1, 0],
        ...                   palette=[(9, 8, 7), (1, 2, 3)])
        >>> m = parse_gif(body)
        >>> (m["fmt"], m["width"], list(m["pixels"]))
        ('gif', 2, [1, 2, 3, 9, 8, 7])
        >>> parse_gif(b"\\x89PNG....") is None
        True
    """
    if payload is None:
        return None
    try:
        buf = bytes(payload)
        if len(buf) < 13 or buf[:6] not in (b"GIF87a", b"GIF89a"):
            return None
        packed = buf[10]
        pos = 13
        gct = None
        if packed & 0x80:
            n = 2 << (packed & 0x07)
            gct = np.frombuffer(
                buf, dtype=np.uint8, count=3 * n, offset=pos
            ).reshape(-1, 3)
            pos += 3 * n
        first = None
        n_frames = 0
        while pos < len(buf):
            b = buf[pos]
            pos += 1
            if b == 0x3B:  # trailer
                break
            if b == 0x21:  # extension: label + sub-blocks
                pos += 1
                while pos < len(buf) and buf[pos] != 0:
                    pos += 1 + buf[pos]
                pos += 1
                continue
            if b != 0x2C:  # image descriptor
                return None
            w = int.from_bytes(buf[pos + 4 : pos + 6], "little")
            h = int.from_bytes(buf[pos + 6 : pos + 8], "little")
            ipacked = buf[pos + 8]
            pos += 9
            lct = None
            if ipacked & 0x80:
                n = 2 << (ipacked & 0x07)
                lct = np.frombuffer(
                    buf, dtype=np.uint8, count=3 * n, offset=pos
                ).reshape(-1, 3)
                pos += 3 * n
            interlaced = bool(ipacked & 0x40)
            mcs = buf[pos]
            pos += 1
            chunks = []
            while pos < len(buf) and buf[pos] != 0:
                ln = buf[pos]
                chunks.append(buf[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            pos += 1  # block terminator
            n_frames += 1
            if first is None:
                first = (w, h, lct, interlaced, mcs, b"".join(chunks))
        if first is None:
            return None
        w, h, lct, interlaced, mcs, data = first
        pal = lct if lct is not None else gct
        if pal is None or w <= 0 or h <= 0 or not 2 <= mcs <= 8:
            return None
        idx = np.array(
            _lzw_decode(data, mcs, w * h), dtype=np.int64
        ).reshape(h, w)
        if interlaced:
            rows = np.empty_like(idx)
            src = 0
            for start, step in _INTERLACE_PASSES:
                n_rows = len(range(start, h, step))
                rows[start::step] = idx[src : src + n_rows]
                src += n_rows
            idx = rows
        if int(idx.max(initial=0)) >= pal.shape[0]:
            return None
        flat = pal[idx.reshape(-1)].reshape(-1).astype(np.int64)
        return {
            "fmt": "gif",
            "width": w,
            "height": h,
            "maxval": 255,
            "n_channels": 3,
            "pixels": flat,
            "n_frames": n_frames,
        }
    except (IndexError, ValueError):
        return None


def _lzw_encode(indices: list[int], min_code_size: int) -> bytes:
    """Real greedy LZW (the standard GIF compressor): emits a leading
    clear code, grows the string table to 4096 then resets with a
    clear code — exactly the stream shape real encoders produce."""
    clear = 1 << min_code_size
    end = clear + 1
    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    def fresh() -> dict:
        return {(i,): i for i in range(clear)}

    table = fresh()
    next_code = end + 1
    width = min_code_size + 1
    emit(clear, width)
    run: tuple[int, ...] = ()
    for px in indices:
        cand = run + (px,)
        if cand in table:
            run = cand
            continue
        emit(table[run], width)
        # The decoder appends one table entry per code it consumes
        # (except the first after a clear), so ITS table length is
        # always next_code - 1 here; mirror its width bump (when that
        # length reaches 2^width) and reset with a clear code when it
        # fills 4096 (codes are 12-bit max).
        table[cand] = next_code
        next_code += 1
        if next_code - 1 == (1 << width) and width < 12:
            width += 1
        if next_code - 1 == 4096:
            emit(clear, width)
            table = fresh()
            next_code = end + 1
            width = min_code_size + 1
        run = (px,)
    if run:
        emit(table[run], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def encode_gif(
    width: int,
    height: int,
    indices,
    palette: list[tuple[int, int, int]],
    interlaced: bool = False,
    animated_copies: int = 1,
) -> bytes:
    """Spec-conformant GIF89a writer (fixture/oracle generator):
    global color table sized to the palette, one image descriptor per
    ``animated_copies`` (the extra frames repeat the first — enough
    to exercise the multi-frame walk), real LZW compression, optional
    4-pass interlace row order. ``indices`` is the row-major palette
    index raster of one frame."""
    indices = [int(i) for i in indices]
    if len(indices) != width * height:
        raise ValueError("indices must be width*height")
    n_pal = max(2, 1 << max(1, (max(len(palette), 2) - 1).bit_length()))
    if n_pal > 256:
        raise ValueError("palette too large")
    mcs = max(2, n_pal.bit_length() - 1)
    out = bytearray(b"GIF89a")
    out += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    out += bytes([0x80 | (n_pal.bit_length() - 2), 0, 0])
    for i in range(n_pal):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        out += bytes([r, g, b])
    grid = np.array(indices, dtype=np.int64).reshape(height, width)
    if interlaced:
        rows = [grid[s::st] for s, st in _INTERLACE_PASSES]
        stream = np.concatenate(rows).reshape(-1).tolist()
    else:
        stream = indices
    lzw = _lzw_encode(stream, mcs)
    frame = bytearray(b"\x2c")
    frame += (0).to_bytes(2, "little") + (0).to_bytes(2, "little")
    frame += width.to_bytes(2, "little") + height.to_bytes(2, "little")
    frame += bytes([0x40 if interlaced else 0x00])
    frame += bytes([mcs])
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        frame += bytes([len(chunk)]) + chunk
    frame += b"\x00"
    for _ in range(animated_copies):
        out += frame
    out += b"\x3b"
    return bytes(out)
