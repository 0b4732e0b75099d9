"""Baseline JPEG (ITU-T T.81) decoding with stdlib + numpy only —
the third real image format after PNM and PNG
(:func:`multimodal.parse_image` dispatches all three), because a real
100 TB web corpus is overwhelmingly JPEG.

Scope (documented subset, honest about what it is):

- baseline sequential DCT (SOF0), 8-bit precision, Huffman entropy
  coding — the overwhelming majority of web JPEGs;
- grayscale and YCbCr with arbitrary sampling factors (4:4:4, 4:2:0,
  4:2:2 ...), chroma upsampled by nearest-neighbor pixel replication
  (T.81 leaves the upsampling filter to the decoder; replication is
  the documented choice here);
- restart markers (DRI/RSTn) honored;
- progressive (SOF2), arithmetic coding, and 12-bit precision return
  ``None`` (unsupported, not wrong).

The decode is the real thing — marker walk, DHT canonical-Huffman
reconstruction, byte-unstuffing bit reader, DC prediction, run/size
AC coefficients, dequantization, dezigzag, orthonormal 2-D IDCT,
level shift, YCbCr→RGB — not a header sniff.

What makes it oracle-checkable without a reference codec in the
container: the fixture encoder (:func:`encode_jpeg`) is a
spec-conformant baseline writer that takes DCT-DOMAIN coefficient
blocks. A DC-only block with quantizer 8 decodes to the closed-form
flat value ``clip(128 + dc, 0, 255)`` (the orthonormal IDCT of a
DC-only block is exactly ``dc/8`` per pixel), so DuckDB states every
pixel statistic of the ``jpeg_decode`` fixtures outright while the
decoder genuinely Huffman-decodes and IDCTs its way there. The AC
and chroma paths are pinned by pytest against an independent IDCT of
the planted coefficients.

Runs inside the same Arrow ``mapInPandas`` stage as the other
decoders: payloads never shuffle, corrupt payloads yield null rows.
"""

from __future__ import annotations

import numpy as np

__all__ = ["parse_jpeg", "encode_jpeg", "ZIGZAG"]

#: zigzag scan order: ZIGZAG[i] = (row, col) of the i-th coefficient
ZIGZAG = []
_r = _c = 0
for _i in range(64):
    ZIGZAG.append((_r, _c))
    if (_r + _c) % 2 == 0:  # moving up-right
        if _c == 7:
            _r += 1
        elif _r == 0:
            _c += 1
        else:
            _r -= 1
            _c += 1
    else:  # moving down-left
        if _r == 7:
            _c += 1
        elif _c == 0:
            _r += 1
        else:
            _r += 1
            _c -= 1
del _r, _c, _i

# orthonormal 8x8 DCT-II basis: A[u, x] = s(u) cos((2x+1) u pi / 16);
# IDCT is A.T @ F @ A
_A = np.zeros((8, 8))
for _u in range(8):
    s = np.sqrt(0.125) if _u == 0 else 0.5
    for _x in range(8):
        _A[_u, _x] = s * np.cos((2 * _x + 1) * _u * np.pi / 16)
del _u, _x, s


def _idct2(block: np.ndarray) -> np.ndarray:
    return _A.T @ block @ _A


_HUFF_CACHE: dict = {}


def _huff_table(counts: list[int], symbols: bytes) -> "_HuffTable":
    """Memoized table compilation: the 65536-entry LUT costs more to
    build than decoding a small image, and a corpus of fixture (or
    same-encoder) JPEGs reuses identical tables across payloads."""
    key = (bytes(counts), bytes(symbols))
    table = _HUFF_CACHE.get(key)
    if table is None:
        table = _HuffTable(counts, symbols)
        if len(_HUFF_CACHE) < 64:  # bound worker-side memory
            _HUFF_CACHE[key] = table
    return table


class _HuffTable:
    """Canonical Huffman table from a DHT (16 counts + symbols),
    compiled to a flat 16-bit-prefix lookup (the classic fast-decode
    table): ``lut_len[idx] == 0`` marks an invalid prefix."""

    def __init__(self, counts: list[int], symbols: bytes):
        self.lut_len = [0] * 65536
        self.lut_sym = [0] * 65536
        code = 0
        k = 0
        for length in range(1, 17):
            # Reject over-subscription BEFORE touching the LUT: a
            # slice-assign past index 65536 silently GROWS the lists
            # (worst case ~8M entries on an adversarial DHT), so the
            # guard must precede the writes, not follow them.
            if code + counts[length - 1] > (1 << length):
                raise ValueError("over-subscribed huffman table")
            for _ in range(counts[length - 1]):
                lo = code << (16 - length)
                hi = (code + 1) << (16 - length)
                self.lut_len[lo:hi] = [length] * (hi - lo)
                self.lut_sym[lo:hi] = [symbols[k]] * (hi - lo)
                code += 1
                k += 1
            code <<= 1


def _split_entropy(buf: bytes, pos: int) -> list[bytes]:
    """Split the entropy-coded data starting at ``pos`` into
    restart-interval segments (RSTn markers are the separators; any
    other marker, e.g. EOI, terminates) and unstuff FF00 → FF in
    each. In entropy data 0xFF is ALWAYS followed by a stuffed 0x00
    or a marker byte, so this scan cannot misfire on payload bytes."""
    segs: list[bytes] = []
    start = i = pos
    n = len(buf)
    while i < n - 1:
        if buf[i] == 0xFF:
            nxt = buf[i + 1]
            if nxt == 0x00:
                i += 2
                continue
            segs.append(buf[start:i].replace(b"\xff\x00", b"\xff"))
            if 0xD0 <= nxt <= 0xD7:  # restart: next segment follows
                i += 2
                start = i
                continue
            return segs  # real marker (EOI/next scan) terminates
        i += 1
    segs.append(buf[start:n].replace(b"\xff\x00", b"\xff"))
    return segs


class _SegReader:
    """MSB-first bit reader over one unstuffed entropy segment. The
    huffman path peeks a 16-bit window into the flat table and
    consumes the decoded length — no per-bit Python loop."""

    __slots__ = ("data", "bitpos", "nbits")

    def __init__(self, data: bytes):
        # 2 padding bytes so the 16-bit peek window never runs off
        # the end mid-symbol (spec pads the tail with 1-bits; zeros
        # here are fine because decoding is bounded by the MCU count)
        self.data = data + b"\x00\x00"
        self.bitpos = 0
        self.nbits = len(data) * 8

    def huff(self, table: _HuffTable) -> int:
        if self.bitpos >= self.nbits:
            raise ValueError("entropy segment exhausted")
        byte = self.bitpos >> 3
        off = self.bitpos & 7
        window = (
            int.from_bytes(self.data[byte : byte + 3], "big") >> (8 - off)
        ) & 0xFFFF
        length = table.lut_len[window]
        if length == 0:
            raise ValueError("invalid huffman code")
        self.bitpos += length
        return table.lut_sym[window]

    def bits(self, k: int) -> int:
        if k == 0:
            return 0
        if self.bitpos + k > self.nbits:
            raise ValueError("entropy segment exhausted")
        byte = self.bitpos >> 3
        off = self.bitpos & 7
        need = off + k
        nbytes = (need + 7) >> 3
        v = int.from_bytes(self.data[byte : byte + nbytes], "big")
        self.bitpos += k
        return (v >> (nbytes * 8 - need)) & ((1 << k) - 1)


def _extend(v: int, size: int) -> int:
    """T.81 EXTEND: map ``size`` magnitude bits to a signed value."""
    return v if v >= (1 << (size - 1)) else v - (1 << size) + 1


def parse_jpeg(payload: bytes) -> dict | None:
    """Decode a baseline JPEG payload. Returns the
    :func:`multimodal.parse_png` dict shape — ``fmt`` (``"jpeg"``),
    ``width``, ``height``, ``maxval`` (255), ``n_channels``,
    ``pixels`` (row-major, interleaved) — or ``None`` for
    out-of-subset / corrupt payloads.

    Examples
    --------
        >>> blocks = [[[10] + [0] * 63]]       # one DC-only block
        >>> img = parse_jpeg(encode_jpeg(8, 8, blocks))
        >>> (img["width"], img["height"], set(img["pixels"].tolist()))
        (8, 8, {138})
        >>> parse_jpeg(b"\\x89PNG....") is None
        True
    """
    if payload is None:
        return None
    try:
        buf = bytes(payload)
        if len(buf) < 4 or buf[:2] != b"\xff\xd8":
            return None
        pos = 2
        qt: dict[int, np.ndarray] = {}
        huff_dc: dict[int, _HuffTable] = {}
        huff_ac: dict[int, _HuffTable] = {}
        frame = None
        restart_interval = 0
        while pos + 4 <= len(buf):
            if buf[pos] != 0xFF:
                return None
            marker = buf[pos + 1]
            if marker == 0xD9:  # EOI
                break
            seg_len = int.from_bytes(buf[pos + 2 : pos + 4], "big")
            seg = buf[pos + 4 : pos + 2 + seg_len]
            if marker == 0xDB:  # DQT
                i = 0
                while i < len(seg):
                    prec, tid = seg[i] >> 4, seg[i] & 15
                    if prec != 0:
                        return None  # 16-bit tables out of subset
                    qt[tid] = np.frombuffer(
                        seg[i + 1 : i + 65], dtype=np.uint8
                    ).astype(np.int64)
                    i += 65
            elif marker == 0xC4:  # DHT
                i = 0
                while i < len(seg):
                    cls, tid = seg[i] >> 4, seg[i] & 15
                    counts = list(seg[i + 1 : i + 17])
                    n_sym = sum(counts)
                    symbols = seg[i + 17 : i + 17 + n_sym]
                    table = _huff_table(counts, symbols)
                    (huff_dc if cls == 0 else huff_ac)[tid] = table
                    i += 17 + n_sym
            elif marker == 0xC0:  # SOF0 baseline
                if seg[0] != 8:
                    return None
                h = int.from_bytes(seg[1:3], "big")
                w = int.from_bytes(seg[3:5], "big")
                ncomp = seg[5]
                comps = []
                for c in range(ncomp):
                    cid, hv, tq = seg[6 + 3 * c : 9 + 3 * c]
                    comps.append(
                        {"id": cid, "h": hv >> 4, "v": hv & 15, "tq": tq}
                    )
                frame = (h, w, comps)
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # non-baseline frame types out of subset
            elif marker == 0xDD:  # DRI
                restart_interval = int.from_bytes(seg[:2], "big")
            elif marker == 0xDA:  # SOS
                if frame is None:
                    return None
                h, w, comps = frame
                ns = seg[0]
                sel = {}
                for c in range(ns):
                    cid, tt = seg[1 + 2 * c : 3 + 2 * c]
                    sel[cid] = (tt >> 4, tt & 15)
                data_pos = pos + 2 + seg_len
                return _decode_scan(
                    buf, data_pos, h, w, comps, sel, qt, huff_dc,
                    huff_ac, restart_interval,
                )
            pos += 2 + seg_len
        return None
    except (IndexError, ValueError, KeyError):
        return None


def _decode_scan(buf, pos, h, w, comps, sel, qt, huff_dc, huff_ac, dri):
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = -(-w // mcu_w)
    mcus_y = -(-h // mcu_h)
    planes = []
    for c in comps:
        pw = mcus_x * c["h"] * 8
        ph = mcus_y * c["v"] * 8
        planes.append(np.zeros((ph, pw)))

    segs = _split_entropy(buf, pos)
    br = _SegReader(segs[0])
    seg_idx = 0
    pred = [0] * len(comps)
    n_mcu = 0
    # entropy pass collects zigzag coefficient vectors per component;
    # dequant + IDCT run vectorized over all blocks afterwards
    coeff_lists: list[list] = [[] for _ in comps]
    block_pos: list[list] = [[] for _ in comps]
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if dri and n_mcu and n_mcu % dri == 0:
                seg_idx += 1  # RSTn boundary: next unstuffed segment
                if seg_idx >= len(segs):
                    raise ValueError("missing restart segment")
                br = _SegReader(segs[seg_idx])
                pred = [0] * len(comps)
            for ci, c in enumerate(comps):
                dc_t = huff_dc[sel[c["id"]][0]]
                ac_t = huff_ac[sel[c["id"]][1]]
                for by in range(c["v"]):
                    for bx in range(c["h"]):
                        coeffs = [0] * 64
                        size = br.huff(dc_t)
                        diff = _extend(br.bits(size), size) if size else 0
                        pred[ci] += diff
                        coeffs[0] = pred[ci]
                        k = 1
                        while k < 64:
                            rs = br.huff(ac_t)
                            if rs == 0x00:  # EOB
                                break
                            run, size = rs >> 4, rs & 15
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            k += run
                            if k > 63 or size == 0:
                                raise ValueError("bad AC run")
                            coeffs[k] = _extend(br.bits(size), size)
                            k += 1
                        coeff_lists[ci].append(coeffs)
                        block_pos[ci].append(
                            ((my * c["v"] + by) * 8, (mx * c["h"] + bx) * 8)
                        )
            n_mcu += 1

    zz = np.array([r_ * 8 + c_ for (r_, c_) in ZIGZAG])
    for ci, c in enumerate(comps):
        q = qt[c["tq"]]
        cf = np.asarray(coeff_lists[ci], dtype=np.float64)  # (n, 64)
        deq = np.zeros_like(cf)
        deq[:, zz] = cf * q  # dezigzag + dequant in one shot
        blocks = deq.reshape(-1, 8, 8)
        px = np.einsum("ua,nuv,vb->nab", _A, blocks, _A)  # batched IDCT
        for bi, (y0, x0) in enumerate(block_pos[ci]):
            planes[ci][y0 : y0 + 8, x0 : x0 + 8] = px[bi]

    # upsample by replication, crop, level-shift
    out = []
    for ci, c in enumerate(comps):
        p = planes[ci]
        p = np.repeat(np.repeat(p, vmax // c["v"], axis=0), hmax // c["h"], axis=1)
        out.append(p[:h, :w] + 128.0)
    if len(out) == 1:
        px = np.clip(np.round(out[0]), 0, 255).astype(np.int64)
        flat = px.reshape(-1)
        n_ch = 1
    else:
        y, cb, cr = out[0], out[1] - 128.0, out[2] - 128.0
        r = y + 1.402 * cr
        g = y - 0.344136 * cb - 0.714136 * cr
        b = y + 1.772 * cb
        rgb = np.stack(
            [np.clip(np.round(x), 0, 255).astype(np.int64) for x in (r, g, b)],
            axis=-1,
        )
        flat = rgb.reshape(-1)
        n_ch = 3
    return {
        "fmt": "jpeg",
        "width": w,
        "height": h,
        "maxval": 255,
        "n_channels": n_ch,
        "pixels": flat,
    }


# ---------------------------------------------------------------------------
# fixture encoder
# ---------------------------------------------------------------------------
class _BitWriter:
    def __init__(self) -> None:
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def write(self, v: int, k: int) -> None:
        self.acc = (self.acc << k) | (v & ((1 << k) - 1))
        self.n += k
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)  # byte stuffing
        self.acc &= (1 << self.n) - 1

    def flush(self) -> None:
        if self.n:
            b = (self.acc << (8 - self.n)) & 0xFF
            b |= (1 << (8 - self.n)) - 1  # pad with 1s per T.81
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.n = 0


def _category(v: int) -> int:
    v = int(v)
    return 0 if v == 0 else abs(v).bit_length()


def _enc_bits(v: int, size: int) -> int:
    return v if v >= 0 else v + (1 << size) - 1


# minimal valid Huffman tables (any conformant tables work — these
# are NOT the Annex K defaults, which a decoder must not assume):
# DC categories 0-11 as 4-bit codes; EOB/ZRL plus every (run, size)
# pair as 8-bit codes
_DC_SYMS = list(range(12))
_AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
_DC_COUNTS = [0, 0, 0, 12] + [0] * 12
_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_AC_SYMS)] + [0] * 8


def _huff_codes(counts, symbols):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[symbols[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


_DC_CODES = _huff_codes(_DC_COUNTS, _DC_SYMS)
_AC_CODES = _huff_codes(_AC_COUNTS, _AC_SYMS)


def encode_jpeg(
    width: int,
    height: int,
    comp_blocks: list[list[list[int]]],
    quant: int | list[int] = 8,
    sampling: list[tuple[int, int]] | None = None,
    restart_interval: int = 0,
) -> bytes:
    """Spec-conformant baseline JPEG writer over DCT-DOMAIN
    coefficients (fixture/oracle generator): ``comp_blocks[c]`` is
    the list of 64-coefficient zigzag-order blocks of component ``c``
    in MCU raster order. 1 component = grayscale, 3 = YCbCr.
    ``quant`` fills the (single) quantization table; with the default
    8, a DC-only block decodes to the flat value ``128 + dc`` — the
    closed form the ``jpeg_decode`` oracle states.
    """
    ncomp = len(comp_blocks)
    if sampling is None:
        sampling = [(1, 1)] * ncomp
    qvals = [quant] * 64 if isinstance(quant, int) else list(quant)

    def seg(marker: int, body: bytes) -> bytes:
        return bytes([0xFF, marker]) + (len(body) + 2).to_bytes(2, "big") + body

    out = bytearray(b"\xff\xd8")  # SOI
    out += seg(0xDB, bytes([0]) + bytes(qvals))  # DQT table 0
    sof = bytes([8]) + height.to_bytes(2, "big") + width.to_bytes(2, "big")
    sof += bytes([ncomp])
    for c in range(ncomp):
        h_, v_ = sampling[c]
        sof += bytes([c + 1, (h_ << 4) | v_, 0])
    out += seg(0xC0, sof)
    out += seg(0xC4, bytes([0x00]) + bytes(_DC_COUNTS) + bytes(_DC_SYMS))
    out += seg(0xC4, bytes([0x10]) + bytes(_AC_COUNTS) + bytes(_AC_SYMS))
    if restart_interval:
        out += seg(0xDD, restart_interval.to_bytes(2, "big"))
    sos = bytes([ncomp])
    for c in range(ncomp):
        sos += bytes([c + 1, 0x00])
    sos += bytes([0, 63, 0])
    out += seg(0xDA, sos)

    hmax = max(s[0] for s in sampling)
    vmax = max(s[1] for s in sampling)
    mcus = (-(-width // (8 * hmax))) * (-(-height // (8 * vmax)))
    bw = _BitWriter()
    pred = [0] * ncomp
    idx = [0] * ncomp
    n_rst = 0
    for m in range(mcus):
        if restart_interval and m and m % restart_interval == 0:
            bw.flush()
            bw.out += bytes([0xFF, 0xD0 + (n_rst % 8)])
            n_rst += 1
            pred = [0] * ncomp
        for c in range(ncomp):
            for _b in range(sampling[c][0] * sampling[c][1]):
                coeffs = comp_blocks[c][idx[c]]
                idx[c] += 1
                diff = coeffs[0] - pred[c]
                pred[c] = coeffs[0]
                size = _category(diff)
                ln, code = _DC_CODES[size]
                bw.write(code, ln)
                if size:
                    bw.write(_enc_bits(diff, size), size)
                run = 0
                for k in range(1, 64):
                    if coeffs[k] == 0:
                        run += 1
                        continue
                    while run >= 16:
                        ln, code = _AC_CODES[0xF0]  # ZRL
                        bw.write(code, ln)
                        run -= 16
                    size = _category(coeffs[k])
                    ln, code = _AC_CODES[(run << 4) | size]
                    bw.write(code, ln)
                    bw.write(_enc_bits(coeffs[k], size), size)
                    run = 0
                if run:  # trailing zeros
                    ln, code = _AC_CODES[0x00]  # EOB
                    bw.write(code, ln)
    bw.flush()
    out += bw.out
    out += b"\xff\xd9"  # EOI
    return bytes(out)
