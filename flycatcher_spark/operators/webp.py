"""WebP (VP8L lossless) decoding with the standard library only —
the seventh real image format behind :func:`multimodal.parse_image`'s
magic-byte dispatch (``sniff_format`` has labeled ``webp`` payloads
since r8; now the lossless flavor decodes).

Scope (documented subset, honest about what it is):

- RIFF container with a ``VP8L`` chunk (simple lossless files);
- the VP8L literal-only bitstream: 14-bit dimensions, LSB-first bit
  packing, the full prefix-code machinery — simple two/one-symbol
  codes AND normal codes transmitted through the 19-symbol
  code-length code (with the 16/17/18 repeat operators and the
  ``kCodeLengthCodeOrder`` transmission order), canonical code
  assignment, and per-pixel green/red/blue/alpha symbol streams;
- the subtract-green transform (the one transform that is pure
  arithmetic — no lookup tables — and therefore verifiable offline);
- NOT in the subset, all returning ``None`` honestly: the other
  transforms (predictor/color/palette), color cache, meta prefix
  codes (entropy-image segmentation), LZ77 backward references, the
  lossy ``VP8 `` flavor, and ``VP8X`` extended containers.

Why this boundary: the r9 blocker for WebP was the 120-entry LZ77
distance-to-neighbor remap table, which cannot be re-derived from
first principles and could not be verified offline — a
recalled-from-memory copy would silently mis-decode real files
(SCALE.md, r9). That table is consulted ONLY when decoding LZ77
distance codes, so a literal-only subset needs none of it: every
construct used here (header layout, prefix-code headers, canonical
assignment, repeat operators) is structural spec machinery whose
correctness the round trip genuinely pins. The fixture encoder
(:func:`encode_webp`) is a real writer of the same subset — actual
frequency-based Huffman code construction with the balanced-complete
fallback, real code-length-code emission with zero-run operators —
so round-trip tests pin real parsing, not a parser testing itself
against canned bytes (the GIF/TIFF/BMP/PDF discipline). Real-world
files that use transforms/LZ77/color-cache are sniffed and counted
by ``format_stats``, never silently mis-decoded.

Bit conventions (RFC 9649 — the WebP spec): the byte stream is read
LSB-first; prefix-code bits are the exception, read starting from the
most significant bit of the code (the DEFLATE convention — RFC 9649
§3.7.1 "in reverse order"). Canonical codes follow the DEFLATE
construction (RFC 1951 §3.2.2). Two-symbol simple codes assign code
0/1 in transmitted symbol order; the encoder always transmits them in
ascending symbol order, which makes transmitted order and canonical
order coincide.
"""

from __future__ import annotations

import struct

import numpy as np

__all__ = [
    "parse_webp",
    "encode_webp",
    "parse_webp_frames",
    "encode_webp_animation",
]

#: transmission order of the code-length code's own lengths
#: (RFC 9649 §3.7.1.2, identical to libwebp's kCodeLengthCodeOrder)
_CODE_LENGTH_ORDER = (
    17, 18, 0, 1, 2, 3, 4, 5, 16, 6, 7, 8, 9, 10, 11, 12, 13, 14, 15
)

_GREEN_ALPHABET = 256 + 24  # literals + length codes (no color cache)
_ARGB_ALPHABET = 256
_DIST_ALPHABET = 40
_MAX_CODE_LEN = 15
_MAX_CL_LEN = 7  # code-length-code lengths are 3-bit fields


class _BitReader:
    """LSB-first bit reader over the VP8L stream."""

    def __init__(self, buf: bytes) -> None:
        self.buf = buf
        self.pos = 0  # bit position

    def read(self, n: int) -> int:
        v = 0
        for i in range(n):
            p = self.pos + i
            byte = p >> 3
            if byte >= len(self.buf):
                raise ValueError("VP8L bitstream truncated")
            v |= ((self.buf[byte] >> (p & 7)) & 1) << i
        self.pos += n
        return v

    def read_bit(self) -> int:
        p = self.pos
        byte = p >> 3
        if byte >= len(self.buf):
            raise ValueError("VP8L bitstream truncated")
        self.pos += 1
        return (self.buf[byte] >> (p & 7)) & 1


class _BitWriter:
    """LSB-first bit writer (mirror of :class:`_BitReader`), buffered:
    writes accumulate as (value, length, msb_first) triples and one
    vectorized expansion + ``np.packbits`` renders the stream — the
    per-bit Python loop was the encoder's hot spot (headers dominate
    on fixture-scale rasters)."""

    def __init__(self) -> None:
        self.vals: list[int] = []
        self.lens: list[int] = []
        self.msb: list[int] = []

    def write(self, value: int, n: int) -> None:
        if n:
            self.vals.append(value)
            self.lens.append(n)
            self.msb.append(0)

    def write_code(self, code: int, length: int) -> None:
        """Prefix-code bits go MSB-of-code first (RFC 9649 §3.7.1)."""
        if length:
            self.vals.append(code)
            self.lens.append(length)
            self.msb.append(1)

    def write_codes_bulk(self, codes: np.ndarray, lengths: np.ndarray) -> None:
        """Append whole symbol streams (MSB-first each) in one go."""
        self.vals.extend(codes.tolist())
        self.lens.extend(lengths.tolist())
        self.msb.extend([1] * len(codes))

    def bit_array(self) -> np.ndarray:
        """Render to a 0/1 uint8 array (stream bit order)."""
        if not self.vals:
            return np.zeros(0, dtype=np.uint8)
        vals = np.asarray(self.vals, dtype=np.int64)
        lens = np.asarray(self.lens, dtype=np.int64)
        msb = np.asarray(self.msb, dtype=bool)
        starts = np.zeros(len(lens), dtype=np.int64)
        np.cumsum(lens[:-1], out=starts[1:])
        out = np.zeros(int(starts[-1] + lens[-1]), dtype=np.uint8)
        for k in range(int(lens.max())):
            sel = lens > k
            shift = np.where(msb[sel], lens[sel] - 1 - k, k)
            out[starts[sel] + k] = (vals[sel] >> shift) & 1
        return out

    def bytes(self) -> bytes:
        return np.packbits(self.bit_array(), bitorder="little").tobytes()


class _BitCursor:
    """Decode-side bit reader over a pre-unpacked bit list — same
    contract as :class:`_BitReader` but ~3x faster in the per-pixel
    walk (plain list indexing, no per-bit method dispatch on bytes).
    Reads past the end raise ValueError (truncated stream)."""

    __slots__ = ("bits", "pos")

    def __init__(self, buf: bytes) -> None:
        self.bits = np.unpackbits(
            np.frombuffer(buf, dtype=np.uint8), bitorder="little"
        ).tolist()
        self.pos = 0

    def read(self, n: int) -> int:
        b = self.bits
        p = self.pos
        if p + n > len(b):
            raise ValueError("VP8L bitstream truncated")
        v = 0
        for i in range(n):
            v |= b[p + i] << i
        self.pos = p + n
        return v

    def read_bit(self) -> int:
        p = self.pos
        if p >= len(self.bits):
            raise ValueError("VP8L bitstream truncated")
        self.pos = p + 1
        return self.bits[p]


# ---------------------------------------------------------------------------
# canonical prefix codes (RFC 1951 §3.2.2 construction)
# ---------------------------------------------------------------------------
def _codes_from_lengths(lengths: list[int]) -> dict[int, tuple[int, int]]:
    """symbol -> (code, length), canonical assignment. Raises on an
    over-subscribed or incomplete code (single-symbol codes are the
    caller's special case and never reach here)."""
    max_len = max(lengths)
    bl_count = [0] * (max_len + 1)
    for ln in lengths:
        if ln:
            bl_count[ln] += 1
    # completeness check (Kraft equality)
    kraft = sum(bl_count[ln] << (max_len - ln) for ln in range(1, max_len + 1))
    if kraft != (1 << max_len):
        raise ValueError("prefix code not complete")
    next_code = [0] * (max_len + 2)
    code = 0
    for ln in range(1, max_len + 1):
        code = (code + bl_count[ln - 1]) << 1
        next_code[ln] = code
    out: dict[int, tuple[int, int]] = {}
    for sym, ln in enumerate(lengths):
        if ln:
            out[sym] = (next_code[ln], ln)
            next_code[ln] += 1
    return out


class _PrefixCode:
    """Decoder-side code: walk one bit at a time, MSB-of-code first."""

    __slots__ = ("table", "const")

    def __init__(self, lengths: list[int] | None, const: int | None = None):
        self.const = const
        if const is not None:
            self.table = None
            return
        codes = _codes_from_lengths(lengths)
        self.table = {(ln, code): sym for sym, (code, ln) in codes.items()}

    def decode(self, br: _BitReader) -> int:
        if self.const is not None:
            return self.const  # zero-bit code (single-symbol simple)
        acc = 0
        for ln in range(1, _MAX_CODE_LEN + 1):
            acc = (acc << 1) | br.read_bit()
            sym = self.table.get((ln, acc))
            if sym is not None:
                return sym
        raise ValueError("invalid prefix code in stream")


def _huffman_lengths(freqs: dict[int, int], max_len: int) -> dict[int, int]:
    """Code lengths from symbol frequencies: real Huffman, with a
    balanced complete code as fallback if the optimal tree is deeper
    than ``max_len`` (possible with skewed counts; the balanced code
    is always valid and the subset favors simplicity over the last
    few bits of density)."""
    import heapq

    syms = sorted(freqs)
    if len(syms) == 1:
        return {syms[0]: 0}  # caller emits a single-symbol simple code
    heap = [(f, i, (s,)) for i, (s, f) in enumerate(sorted(freqs.items()))]
    heapq.heapify(heap)
    depth: dict[int, int] = {s: 0 for s in syms}
    i = len(heap)
    while len(heap) > 1:
        f1, _, g1 = heapq.heappop(heap)
        f2, _, g2 = heapq.heappop(heap)
        for s in g1 + g2:
            depth[s] += 1
        heapq.heappush(heap, (f1 + f2, i, g1 + g2))
        i += 1
    if max(depth.values()) <= max_len:
        return depth
    # balanced complete code: a symbols at L-1, rest at L
    n = len(syms)
    bits = (n - 1).bit_length()
    n_short = (1 << bits) - n
    return {
        s: (bits - 1 if j < n_short else bits) for j, s in enumerate(syms)
    }


# ---------------------------------------------------------------------------
# prefix-code headers (RFC 9649 §3.7.1.1–3.7.1.2)
# ---------------------------------------------------------------------------
def _read_prefix_code(br: _BitReader, alphabet_size: int) -> _PrefixCode:
    if br.read_bit():  # simple code
        num_symbols = br.read_bit() + 1
        first_8bit = br.read_bit()
        s0 = br.read(8 if first_8bit else 1)
        if num_symbols == 1:
            if s0 >= alphabet_size:
                raise ValueError("simple-code symbol out of range")
            return _PrefixCode(None, const=s0)
        s1 = br.read(8)
        if s0 >= alphabet_size or s1 >= alphabet_size or s0 == s1:
            raise ValueError("bad simple-code symbols")
        lengths = [0] * alphabet_size
        lengths[s0] = lengths[s1] = 1
        return _PrefixCode(lengths)
    # normal code: lengths arrive through the code-length code
    num_cl = br.read(4) + 4
    if num_cl > len(_CODE_LENGTH_ORDER):
        raise ValueError("bad code-length count")
    cl_lengths = [0] * 19
    for i in range(num_cl):
        cl_lengths[_CODE_LENGTH_ORDER[i]] = br.read(3)
    if sum(cl_lengths) == 0:
        raise ValueError("empty code-length code")
    cl_code = _PrefixCode(cl_lengths)
    if br.read_bit():  # explicit max_symbol cap
        length_nbits = 2 + 2 * br.read(3)
        max_symbol = 2 + br.read(length_nbits)
    else:
        max_symbol = alphabet_size
    lengths = [0] * alphabet_size
    prev_len = 8
    i = 0
    while i < alphabet_size:
        if max_symbol == 0:
            break  # remaining symbols keep length 0
        max_symbol -= 1
        s = cl_code.decode(br)
        if s < 16:
            lengths[i] = s
            i += 1
            if s:
                prev_len = s
        elif s == 16:  # repeat previous non-zero length 3-6 times
            rep = 3 + br.read(2)
            if i + rep > alphabet_size:
                raise ValueError("length repeat overflows alphabet")
            for _ in range(rep):
                lengths[i] = prev_len
                i += 1
        elif s == 17:  # short zero run 3-10
            i += 3 + br.read(3)
        else:  # 18: long zero run 11-138
            i += 11 + br.read(7)
    if i > alphabet_size:
        raise ValueError("length run overflows alphabet")
    nonzero = [s for s, ln in enumerate(lengths) if ln]
    if len(nonzero) == 1:
        return _PrefixCode(None, const=nonzero[0])
    return _PrefixCode(lengths)


def _write_prefix_code(
    bw: _BitWriter, lengths: dict[int, int], alphabet_size: int
) -> None:
    """Emit one prefix-code header for ``lengths`` (symbol -> length;
    a single entry means the zero-bit single-symbol code)."""
    syms = sorted(lengths)
    if len(syms) <= 2 and all(s <= 255 for s in syms):
        # simple code (ascending symbol order: transmitted order ==
        # canonical order, so both decoder conventions agree)
        bw.write(1, 1)
        bw.write(len(syms) - 1, 1)
        s0 = syms[0]
        if s0 <= 1:
            bw.write(0, 1)  # 1-bit first symbol
            bw.write(s0, 1)
        else:
            bw.write(1, 1)
            bw.write(s0, 8)
        if len(syms) == 2:
            bw.write(syms[1], 8)
        return
    bw.write(0, 1)  # normal code
    # RLE the per-symbol lengths into code-length symbols
    full = [lengths.get(s, 0) for s in range(alphabet_size)]
    # trailing zeros are dropped and the explicit max_symbol cap
    # (written below) tells the decoder how many code-length symbols
    # to read — the spec's trimmed-length mechanism
    last = max(s for s, ln in enumerate(full) if ln)
    cl_stream: list[tuple[int, int, int]] = []  # (symbol, extra, nbits)
    i = 0
    while i <= last:
        if full[i] == 0:
            j = i
            while j <= last and full[j] == 0:
                j += 1
            run = j - i
            while run >= 3:
                if run >= 11:
                    r = min(run, 138)
                    cl_stream.append((18, r - 11, 7))
                else:
                    r = min(run, 10)
                    cl_stream.append((17, r - 3, 3))
                run -= r
            for _ in range(run):
                cl_stream.append((0, 0, 0))
            i = j
        else:
            cl_stream.append((full[i], 0, 0))
            i += 1
    while len(cl_stream) < 2:  # max_symbol cap floor is 2; pad with 0s
        cl_stream.append((0, 0, 0))
    # code-length code from the cl-symbol frequencies
    cl_freq: dict[int, int] = {}
    for s, _, _ in cl_stream:
        cl_freq[s] = cl_freq.get(s, 0) + 1
    cl_lengths = _huffman_lengths(cl_freq, _MAX_CL_LEN)
    if len(cl_lengths) == 1:
        # the cl code needs >= 2 symbols to be a complete 1-bit code;
        # pad with an unused symbol (smallest absent one)
        pad = next(s for s in range(19) if s not in cl_lengths)
        only = next(iter(cl_lengths))
        cl_lengths = {only: 1, pad: 1}
    cl_codes = _codes_from_lengths(
        [cl_lengths.get(s, 0) for s in range(19)]
    )
    # transmit cl lengths in _CODE_LENGTH_ORDER, covering every
    # nonzero entry (minimum 4 per spec)
    num_cl = max(
        4,
        1 + max(
            (i for i, s in enumerate(_CODE_LENGTH_ORDER) if s in cl_lengths),
            default=0,
        ),
    )
    bw.write(num_cl - 4, 4)
    for i in range(num_cl):
        bw.write(cl_lengths.get(_CODE_LENGTH_ORDER[i], 0), 3)
    # explicit max_symbol = number of code-length symbols transmitted
    # (each decoder iteration consumes one, literal or repeat op)
    bw.write(1, 1)
    k = len(cl_stream) - 2
    length_nbits = 2
    while (1 << length_nbits) <= k:
        length_nbits += 2
    bw.write((length_nbits - 2) // 2, 3)
    bw.write(k, length_nbits)
    for s, extra, nbits in cl_stream:
        code, ln = cl_codes[s]
        bw.write_code(code, ln)
        if nbits:
            bw.write(extra, nbits)


# ---------------------------------------------------------------------------
# decode
# ---------------------------------------------------------------------------
def _decode_vp8l_body(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """Decode one VP8L bitstream (the ``VP8L`` chunk body, signature
    byte included) to ``(width, height, alpha_hint, rgba)`` where
    ``rgba`` is an ``(npx, 4)`` uint8 array in row-major pixel order.
    Raises ValueError for malformed streams and for spec features
    outside the literal-only subset."""
    if not data or data[0] != 0x2F:
        raise ValueError("not a VP8L stream")
    br = _BitCursor(data[1:])
    width = br.read(14) + 1
    height = br.read(14) + 1
    alpha_hint = br.read_bit()
    if br.read(3) != 0:
        raise ValueError("VP8L version must be 0")
    # transform chain: ONLY the subtract-green transform is in
    # the subset — it is pure arithmetic (add green back to red/
    # blue mod 256, RFC 9649 §3.5.3), carries no data and no
    # lookup tables, so it is verifiable offline; predictor(0),
    # color(1) and palette(3) transforms raise honestly.
    subtract_green = False
    while br.read_bit():
        ttype = br.read(2)
        if ttype != 2 or subtract_green:  # 2 = subtract green
            raise ValueError("out-of-subset transform")
        subtract_green = True
    if br.read_bit():
        raise ValueError("color cache: not in the subset")
    if br.read_bit():
        raise ValueError("meta prefix codes: not in the subset")
    green = _read_prefix_code(br, _GREEN_ALPHABET)
    red = _read_prefix_code(br, _ARGB_ALPHABET)
    blue = _read_prefix_code(br, _ARGB_ALPHABET)
    alpha = _read_prefix_code(br, _ARGB_ALPHABET)
    _read_prefix_code(br, _DIST_ALPHABET)  # distance code (unused)
    npx = width * height
    # hot loop: inline the bit walk over the cursor's plain list
    # (locals only — per-pixel method dispatch costs ~3x here)
    bits = br.bits
    p = br.pos
    nbits = len(bits)
    chans = [
        (c.const, c.table) for c in (green, red, blue, alpha)
    ]
    vals: list[list[int]] = [[], [], [], []]
    for _ in range(npx):
        for ci in range(4):
            const, table = chans[ci]
            if const is not None:
                vals[ci].append(const)
                continue
            acc = 0
            ln = 0
            while True:
                if p >= nbits:
                    raise ValueError("VP8L bitstream truncated")
                acc = (acc << 1) | bits[p]
                p += 1
                ln += 1
                sym = table.get((ln, acc))
                if sym is not None:
                    break
                if ln > _MAX_CODE_LEN:
                    raise ValueError("invalid prefix code in stream")
            vals[ci].append(sym)
        if vals[0][-1] >= 256:
            raise ValueError("LZ77 length code: not in the subset")
    out = np.empty((npx, 4), dtype=np.uint8)
    out[:, 1] = vals[0]  # green
    out[:, 0] = vals[1]  # red
    out[:, 2] = vals[2]  # blue
    out[:, 3] = vals[3]  # alpha
    if subtract_green:
        # inverse transform: red/blue had green subtracted mod 256
        g_col = out[:, 1].astype(np.int64)
        out[:, 0] = ((out[:, 0].astype(np.int64) + g_col) & 0xFF).astype(
            np.uint8
        )
        out[:, 2] = ((out[:, 2].astype(np.int64) + g_col) & 0xFF).astype(
            np.uint8
        )
    return width, height, alpha_hint, out


def _walk_riff(buf: bytes):
    """Yield ``(tag, body)`` for each top-level RIFF sub-chunk."""
    pos = 12
    while pos + 8 <= len(buf):
        tag = buf[pos : pos + 4]
        (size,) = struct.unpack_from("<I", buf, pos + 4)
        body = buf[pos + 8 : pos + 8 + size]
        if len(body) < size:
            raise ValueError("truncated RIFF chunk")
        yield tag, body
        pos += 8 + size + (size & 1)


def parse_webp(payload: bytes) -> dict | None:
    r"""Decode a lossless WebP payload (the literal-only VP8L subset
    — see the module docstring). Returns the
    :func:`multimodal.parse_png` dict shape — ``fmt`` (``"webp"``),
    ``width``/``height``, ``maxval`` (255), ``n_channels`` (3, or 4
    when the header's alpha hint is set), flat ``pixels`` — or
    ``None`` for malformed payloads and for spec features outside
    the subset (transforms, color cache, meta prefix, LZ77, lossy
    VP8, VP8X stills; for ANIMATED lossless files see
    :func:`parse_webp_frames`).

    Examples
    --------
        >>> import numpy as np
        >>> px = np.arange(2 * 2 * 3, dtype=np.uint8)
        >>> m = parse_webp(encode_webp(px, 2, 2, 3))
        >>> (m["fmt"], m["width"], m["height"], list(m["pixels"]))
        ('webp', 2, 2, [0, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 11])
        >>> parse_webp(b"RIFF....WEBPVP8 ") is None   # lossy: not in subset
        True
    """
    try:
        if payload is None or len(payload) < 21:
            return None
        buf = bytes(payload)
        if buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
            return None
        # chunk walk (plain container: VP8L should be first; tolerate
        # leading metadata chunks but reject VP8X/VP8 flavors)
        data = None
        for tag, body in _walk_riff(buf):
            if tag == b"VP8L":
                data = body
                break
            if tag in (b"VP8 ", b"VP8X"):
                return None  # lossy / extended: not in the subset
        if data is None:
            return None
        width, height, alpha_hint, out = _decode_vp8l_body(data)
        n_ch = 4 if alpha_hint else 3
        flat = out[:, :n_ch].reshape(-1).astype(np.int64)
        return {
            "fmt": "webp",
            "width": width,
            "height": height,
            "maxval": 255,
            "n_channels": n_ch,
            "pixels": flat,
        }
    except (ValueError, IndexError, struct.error, OverflowError):
        return None


# ---------------------------------------------------------------------------
# encode (fixture/oracle generator — same discipline as encode_gif /
# encode_bmp: a real writer of the documented subset)
# ---------------------------------------------------------------------------
def _encode_vp8l_body(
    pixels,
    width: int,
    height: int,
    channels: int = 3,
    subtract_green: bool = False,
) -> bytes:
    """Build one VP8L bitstream (signature byte + bits) for an RGB(A)
    raster — the shared engine behind :func:`encode_webp` (still
    images) and :func:`encode_webp_animation` (per-ANMF frames)."""
    if channels not in (3, 4):
        raise ValueError("channels must be 3 or 4")
    arr = np.asarray(pixels, dtype=np.int64).reshape(
        height * width, channels
    )
    if arr.min() < 0 or arr.max() > 255:
        raise ValueError("samples must be 0-255")
    return _encode_vp8l_from_arr(arr, width, height, channels, subtract_green)


def encode_webp(
    pixels,
    width: int,
    height: int,
    channels: int = 3,
    subtract_green: bool = False,
) -> bytes:
    """Encode an RGB(A) raster as a real lossless WebP (literal-only
    VP8L): per-channel frequency-based prefix codes, genuine
    code-length-code headers, LSB-first bit packing, RIFF container.
    ``pixels`` is the flat row-major raster (``width * height *
    channels`` values, 0-255); ``channels`` is 3 (alpha hint clear,
    constant-255 alpha coded as a zero-bit single-symbol code) or 4.
    ``subtract_green`` emits the subtract-green transform (the one
    transform in the decode subset): red/blue are stored minus green
    mod 256 — the form libwebp's lossless encoder emits almost
    always, so covering it meaningfully widens real-file decode.
    """
    body = _encode_vp8l_body(pixels, width, height, channels, subtract_green)
    return _riff(_chunk(b"VP8L", body))


def _encode_vp8l_from_arr(
    arr: np.ndarray,
    width: int,
    height: int,
    channels: int,
    subtract_green: bool,
) -> bytes:
    r = arr[:, 0]
    g = arr[:, 1]
    b = arr[:, 2]
    a = arr[:, 3] if channels == 4 else np.full(len(arr), 255, np.int64)
    if subtract_green:
        r = (r - g) & 0xFF
        b = (b - g) & 0xFF

    bw = _BitWriter()
    bw.write(width - 1, 14)
    bw.write(height - 1, 14)
    bw.write(1 if channels == 4 else 0, 1)  # alpha hint
    bw.write(0, 3)  # version
    if subtract_green:
        bw.write(1, 1)  # one transform follows
        bw.write(2, 2)  # type 2 = subtract green (no payload)
    bw.write(0, 1)  # end of transform chain
    bw.write(0, 1)  # no color cache
    bw.write(0, 1)  # no meta prefix

    def lengths_of(vals: np.ndarray) -> dict[int, int]:
        uniq, counts = np.unique(vals, return_counts=True)
        return _huffman_lengths(
            {int(s): int(c) for s, c in zip(uniq, counts)}, _MAX_CODE_LEN
        )

    planes = [
        (lengths_of(g), _GREEN_ALPHABET, g),
        (lengths_of(r), _ARGB_ALPHABET, r),
        (lengths_of(b), _ARGB_ALPHABET, b),
        (lengths_of(a), _ARGB_ALPHABET, a),
    ]
    code_cols = []
    len_cols = []
    n = len(arr)
    for lens, alphabet, vals in planes:
        _write_prefix_code(bw, lens, alphabet)
        if len(lens) == 1:  # zero-bit code: nothing per pixel
            code_cols.append(np.zeros(n, dtype=np.int64))
            len_cols.append(np.zeros(n, dtype=np.int64))
        else:
            full = [0] * alphabet
            for s, ln in lens.items():
                full[s] = ln
            table = _codes_from_lengths(full)
            code_lut = np.zeros(256, dtype=np.int64)
            len_lut = np.zeros(256, dtype=np.int64)
            for s, (code, ln) in table.items():
                code_lut[s] = code
                len_lut[s] = ln
            code_cols.append(code_lut[vals])
            len_cols.append(len_lut[vals])
    _write_prefix_code(bw, {0: 0}, _DIST_ALPHABET)  # unused distance code

    # pixel-stream emission: per-pixel channel order is g,r,b,a
    # (column interleave); the buffered writer renders headers +
    # pixels in ONE vectorized expansion + packbits.
    code_seq = np.stack(code_cols, axis=1).reshape(-1)
    len_seq = np.stack(len_cols, axis=1).reshape(-1)
    bw.write_codes_bulk(code_seq, len_seq)
    return b"\x2f" + bw.bytes()


def _chunk(tag: bytes, body: bytes) -> bytes:
    """One RIFF sub-chunk with the mandatory even-size padding."""
    out = tag + struct.pack("<I", len(body)) + body
    if len(body) & 1:
        out += b"\x00"
    return out


def _riff(chunks: bytes) -> bytes:
    riff = b"WEBP" + chunks
    return b"RIFF" + struct.pack("<I", len(riff)) + riff


# ---------------------------------------------------------------------------
# animated WebP (VP8X container, ANIM/ANMF chunks — RFC 9649 extended
# file format) over lossless literal-only frames
# ---------------------------------------------------------------------------
#: VP8X feature-flags byte, Animation bit. Decode NEVER reads these
#: flags — frames are detected by ANMF chunk presence, so a
#: mis-remembered bit cannot mis-decode real files; the writer sets it
#: for third-party-reader conformance only.
_VP8X_ANIM_FLAG = 0x02


def _u24(v: int) -> bytes:
    return struct.pack("<I", v)[:3]


def _r24(b: bytes, off: int) -> int:
    return b[off] | (b[off + 1] << 8) | (b[off + 2] << 16)


def encode_webp_animation(
    canvas_width: int,
    canvas_height: int,
    frames: list[dict],
    loop_count: int = 0,
    background: tuple[int, int, int, int] = (255, 255, 255, 255),
) -> bytes:
    """Encode an animated lossless WebP: ``VP8X`` + ``ANIM`` + one
    ``ANMF`` per frame, each frame a literal-only VP8L bitstream
    (:func:`_encode_vp8l_body`). Each ``frames`` entry:

    - ``x``, ``y`` — frame offset on the canvas (MUST be even: the
      container stores offsets divided by 2);
    - ``width``, ``height``, ``pixels`` — the frame raster (flat,
      RGBA when ``channels=4`` in the entry, else RGB);
    - ``duration_ms`` (default 100);
    - ``blend`` (default True) — alpha-blend onto the canvas; False
      overwrites the rect;
    - ``dispose`` (default False) — True restores the frame rect to
      the background color after display.

    ``background`` is the ANIM background color (stored B,G,R,A per
    spec §"ANIM chunk"). The ANMF flags byte packs disposal in bit 0
    and blending in bit 1 (1 = do NOT blend)."""
    chunks = []
    for f in frames:
        if f["x"] % 2 or f["y"] % 2:
            raise ValueError("ANMF frame offsets must be even")
        if f["x"] + f["width"] > canvas_width or (
            f["y"] + f["height"] > canvas_height
        ):
            raise ValueError("frame exceeds canvas")
        ch = int(f.get("channels", 4 if len(f["pixels"]) == f["width"] * f["height"] * 4 else 3))
        body = _encode_vp8l_body(
            f["pixels"], f["width"], f["height"], channels=ch
        )
        flags = (1 if f.get("dispose", False) else 0) | (
            0 if f.get("blend", True) else 2
        )
        anmf = (
            _u24(f["x"] // 2)
            + _u24(f["y"] // 2)
            + _u24(f["width"] - 1)
            + _u24(f["height"] - 1)
            + _u24(int(f.get("duration_ms", 100)))
            + bytes([flags])
            + _chunk(b"VP8L", body)
        )
        chunks.append(_chunk(b"ANMF", anmf))
    b, g, r, a = (
        background[2],
        background[1],
        background[0],
        background[3],
    )
    anim = bytes([b, g, r, a]) + struct.pack("<H", loop_count)
    vp8x = (
        bytes([_VP8X_ANIM_FLAG, 0, 0, 0])
        + _u24(canvas_width - 1)
        + _u24(canvas_height - 1)
    )
    return _riff(
        _chunk(b"VP8X", vp8x) + _chunk(b"ANIM", anim) + b"".join(chunks)
    )


def parse_webp_frames(payload: bytes, every_n: int = 1) -> dict | None:
    """Animated-WebP sampled-frame decode (r10, the GIF discipline
    applied to the VP8X/ANIM/ANMF container): compose the canvas
    through the frame sequence — alpha-blend or overwrite per the
    ANMF blending bit, dispose-to-background per the disposal bit —
    and snapshot the composed canvas at every ``every_n``-th frame.

    Frame payloads must be lossless literal-only VP8L (the decode
    subset); lossy ANMF frames (``VP8 ``/``ALPH``) return ``None``
    honestly. Frames PAST the last sampled index never entropy-decode
    (the structural ANMF walk still counts them). The canvas
    initializes to the ANIM background color — the literal spec
    reading, same choice as the GIF arm (renderers compositing onto
    page content treat it as transparent instead).

    A still lossless file (plain ``VP8L`` container, no ANMF)
    parses as a single-frame animation on its own canvas, so one
    media corpus can mix stills and animations row-by-row.

    Returns ``{"fmt": "webp", "canvas_width", "canvas_height",
    "n_frames", "frames": [{"frame_idx", "duration_ms", "dispose",
    "pixels"}, ...]}`` with full-canvas RGBA pixel arrays (flat,
    int64), or ``None`` for non-WebP / corrupt / out-of-subset
    payloads.

    Examples
    --------
        >>> buf = encode_webp_animation(2, 2, [
        ...     dict(x=0, y=0, width=2, height=2,
        ...          pixels=[9, 8, 7] * 4, channels=3),
        ...     dict(x=0, y=0, width=2, height=2,
        ...          pixels=[1, 2, 3] * 4, channels=3, duration_ms=40),
        ... ])
        >>> m = parse_webp_frames(buf)
        >>> (m["n_frames"], list(m["frames"][1]["pixels"][:4]))
        (2, [1, 2, 3, 255])
    """
    if payload is None or every_n < 1:
        return None
    try:
        buf = bytes(payload)
        if len(buf) < 21 or buf[:4] != b"RIFF" or buf[8:12] != b"WEBP":
            return None
        anmf = []
        vp8x = None
        anim = None
        still = None
        for tag, body in _walk_riff(buf):
            if tag == b"ANMF":
                anmf.append(body)
            elif tag == b"VP8X":
                vp8x = body
            elif tag == b"ANIM":
                anim = body
            elif tag == b"VP8L" and still is None:
                still = body
            elif tag in (b"VP8 ", b"ALPH"):
                return None  # lossy flavor: not in the subset
        if not anmf:
            # still image: a one-frame animation on its own canvas
            if still is None:
                return None
            w, h, _hint, rgba = _decode_vp8l_body(still)
            return {
                "fmt": "webp",
                "canvas_width": w,
                "canvas_height": h,
                "n_frames": 1,
                "frames": [
                    {
                        "frame_idx": 0,
                        "duration_ms": 0,
                        "dispose": False,
                        "pixels": rgba.reshape(-1).astype(np.int64),
                    }
                ],
            }
        if vp8x is None or len(vp8x) < 10:
            return None
        cw = _r24(vp8x, 4) + 1
        chh = _r24(vp8x, 7) + 1
        if anim is None or len(anim) < 6:
            return None
        bg = np.array(
            [anim[2], anim[1], anim[0], anim[3]], dtype=np.uint8
        )  # stored B,G,R,A
        canvas = np.tile(bg, (chh, cw, 1)).reshape(chh, cw, 4)
        n_frames = len(anmf)
        last_sampled = ((n_frames - 1) // every_n) * every_n
        out_frames = []
        for idx, body in enumerate(anmf):
            if idx > last_sampled:
                break  # frames past the window never entropy-decode
            if len(body) < 16:
                return None
            fx = _r24(body, 0) * 2
            fy = _r24(body, 3) * 2
            fw = _r24(body, 6) + 1
            fh = _r24(body, 9) + 1
            dur = _r24(body, 12)
            flags = body[15]
            dispose = bool(flags & 1)
            no_blend = bool(flags & 2)
            # frame data sub-chunks start at offset 16
            sub = body[16:]
            frame_data = None
            pos = 0
            while pos + 8 <= len(sub):
                tag = sub[pos : pos + 4]
                (size,) = struct.unpack_from("<I", sub, pos + 4)
                cbody = sub[pos + 8 : pos + 8 + size]
                if len(cbody) < size:
                    return None
                if tag == b"VP8L":
                    frame_data = cbody
                    break
                if tag in (b"VP8 ", b"ALPH"):
                    return None  # lossy frame: not in the subset
                pos += 8 + size + (size & 1)
            if frame_data is None:
                return None
            w, h, _hint, rgba = _decode_vp8l_body(frame_data)
            if (w, h) != (fw, fh) or fx + fw > cw or fy + fh > chh:
                return None
            rect = rgba.reshape(h, w, 4)
            window = canvas[fy : fy + fh, fx : fx + fw]
            if no_blend:
                window[:] = rect
            else:
                # src-over alpha blending in integer arithmetic
                # (RFC 9649: blend = src + dst * (1 - src_alpha))
                sa = rect[:, :, 3:4].astype(np.int64)
                da = window[:, :, 3:4].astype(np.int64)
                oa = sa + da * (255 - sa) // 255
                num = rect[:, :, :3].astype(np.int64) * sa * 255 + (
                    window[:, :, :3].astype(np.int64) * da * (255 - sa)
                )
                safe = np.maximum(oa, 1)
                window[:, :, :3] = (num // (safe * 255)).astype(np.uint8)
                window[:, :, 3:4] = oa.astype(np.uint8)
            if idx % every_n == 0:
                out_frames.append(
                    {
                        "frame_idx": idx,
                        "duration_ms": dur,
                        "dispose": dispose,
                        "pixels": canvas.reshape(-1).astype(np.int64),
                    }
                )
            if dispose:
                canvas[fy : fy + fh, fx : fx + fw] = bg
        return {
            "fmt": "webp",
            "canvas_width": cw,
            "canvas_height": chh,
            "n_frames": n_frames,
            "frames": out_frames,
        }
    except (ValueError, IndexError, struct.error, OverflowError):
        return None
