"""Baseline JPEG (JFIF) codec for 8-bit grayscale — stdlib + numpy only.

This closes the last media-codec stub in the multimodal family
(reference parity anchor: the reference treats media as opaque S3
objects end-to-end — `src/dask_processing.py:31-33` never decodes — so
everything here is capability the Spark engine adds for the
training-data pipeline tier, per SURVEY.md §2.C).

Supported subset (enforced, with real errors on anything else):
baseline sequential DCT (SOF0), 8-bit precision, single grayscale
component, no subsampling, dimensions a multiple of 8, no restart
markers. That subset is decoded FOR REAL:

- marker walk: SOI / APPn / COM / DQT / DHT / SOF0 / SOS / EOI, with
  length fields honoured and progressive (SOF2) explicitly rejected;
- DQT parsed from the file in zigzag order (the decoder never peeks at
  the encoder's table constant);
- DHT canonical Huffman tables built with the ITU-T T.81 Annex C
  algorithm and decoded with the F.2.2.3 mincode/maxcode/valptr walk —
  any spec-legal table shape works, not just the ones our encoder emits;
- entropy decode: DC differential coding with magnitude categories and
  EXTEND sign recovery, AC run/size symbols with ZRL (16-zero runs) and
  EOB, 0xFF00 byte-unstuffing;
- dequantize, de-zigzag, orthonormal 8x8 IDCT (numpy matrix form),
  level shift +128, floor(x+.5) rounding, clamp to [0, 255].

The encoder half works in the QUANTIZED COEFFICIENT domain: callers
choose the per-block zigzag coefficient vector and get a spec-valid
JFIF byte stream back. That is what makes the decode value-checkable
bit-exactly by a SQL oracle — the Huffman/run-length/zigzag/dequant
pipeline is integer-exact, so the oracle recomputes checksums from the
generating arithmetic with no float tolerance. The IDCT pixel path is
verified in unit tests against an independent four-loop cosine-sum
reference (tests/test_units.py) rather than the SQL oracle, because
cos() across libms is not bit-stable enough for a value-hash gate.
"""

from __future__ import annotations

import math
import struct

import numpy as np

# ---------------------------------------------------------------- tables

# ITU-T T.81 Annex K.1 luminance quantization table (natural order).
QTABLE_NATURAL = np.array([
    [16, 11, 10, 16, 24, 40, 51, 61],
    [12, 12, 14, 19, 26, 58, 60, 55],
    [14, 13, 16, 24, 40, 57, 69, 56],
    [14, 17, 22, 29, 51, 87, 80, 62],
    [18, 22, 37, 56, 68, 109, 103, 77],
    [24, 35, 55, 64, 81, 104, 113, 92],
    [49, 64, 78, 87, 103, 121, 120, 101],
    [72, 92, 95, 98, 112, 100, 103, 99],
], dtype=np.int64)


def _zigzag_order() -> list[tuple[int, int]]:
    """The 64 (row, col) positions in JPEG zigzag order (T.81 fig. 5):
    walk anti-diagonals, alternating direction."""
    order = []
    for s in range(15):
        rng = range(s, -1, -1) if s % 2 == 0 else range(0, s + 1)
        for r in rng:
            c = s - r
            if r < 8 and c < 8:
                order.append((r, c))
    return order


ZIGZAG = _zigzag_order()                      # k -> (r, c)
QTABLE_ZZ = np.array([QTABLE_NATURAL[r][c] for r, c in ZIGZAG],
                     dtype=np.int64)          # zigzag-order quant table

# Huffman table specs our encoder emits: canonical fixed-length tables
# covering every symbol the coefficient generators can produce (DC
# categories 0..11; AC run/size for runs 0..15 x sizes 1..5, plus EOB
# and ZRL). Fixed-length is a spec-legal "optimized tables" choice —
# Kraft holds (12/256 and 82/256) — and the decoder does NOT assume it:
# it builds whatever the DHT segment declares.
DC_HUFFVAL = list(range(12))
DC_BITS = [0] * 7 + [len(DC_HUFFVAL)] + [0] * 8
AC_HUFFVAL = sorted([0x00, 0xF0]
                    + [(r << 4) | s for r in range(16) for s in range(1, 6)])
AC_BITS = [0] * 7 + [len(AC_HUFFVAL)] + [0] * 8

# ------------------------------------------------------------- huffman


def canonical_codes(bits: list[int], huffval: list[int]) -> dict:
    """T.81 Annex C.2: symbol -> (code, size) for a canonical table.
    ``bits[i]`` = number of codes of length i+1; ``huffval`` lists the
    symbols in code order."""
    sizes: list[int] = []
    for i, n in enumerate(bits):
        sizes += [i + 1] * n
    if len(sizes) != len(huffval):
        raise ValueError("BITS total disagrees with HUFFVAL length")
    codes, code, prev = {}, 0, sizes[0] if sizes else 0
    for sym, size in zip(huffval, sizes):
        code <<= size - prev
        codes[sym] = (code, size)
        code += 1
        prev = size
    return codes


def _decode_tables(bits: list[int], huffval: list[int]):
    """T.81 F.2.2.3 decoder tables: (mincode, maxcode, valptr, huffval)
    indexed by code length 1..16; maxcode[l] == -1 means no codes."""
    mincode, maxcode, valptr = [0] * 17, [-1] * 17, [0] * 17
    code, k = 0, 0
    for ln in range(1, 17):
        if bits[ln - 1]:
            valptr[ln] = k
            mincode[ln] = code
            code += bits[ln - 1]
            k += bits[ln - 1]
            maxcode[ln] = code - 1
        code <<= 1
    return mincode, maxcode, valptr, list(huffval)


class _BitWriter:
    """MSB-first bit accumulator with JPEG 0xFF byte stuffing."""

    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, code: int, size: int) -> None:
        self.acc = (self.acc << size) | (code & ((1 << size) - 1))
        self.nbits += size
        while self.nbits >= 8:
            b = (self.acc >> (self.nbits - 8)) & 0xFF
            self.nbits -= 8
            self.buf.append(b)
            if b == 0xFF:
                self.buf.append(0x00)
        self.acc &= (1 << self.nbits) - 1

    def flush(self) -> bytes:
        if self.nbits:
            pad = 8 - self.nbits
            self.write((1 << pad) - 1, pad)   # pad with 1-bits per spec
        return bytes(self.buf)


class _BitReader:
    """MSB-first bit reader over entropy-coded data; un-stuffs 0xFF00
    and refuses to run past a real marker or the buffer end."""

    def __init__(self, data: bytes, pos: int = 0) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def read_bit(self) -> int:
        if self.n == 0:
            if self.pos >= len(self.data):
                raise ValueError("truncated JPEG entropy stream")
            b = self.data[self.pos]
            self.pos += 1
            if b == 0xFF:
                if self.pos >= len(self.data):
                    raise ValueError("truncated JPEG entropy stream")
                if self.data[self.pos] != 0x00:
                    raise ValueError("marker inside entropy stream")
                self.pos += 1               # consume the stuffed 0x00
            self.acc, self.n = b, 8
        self.n -= 1
        return (self.acc >> self.n) & 1

    def read_bits(self, t: int) -> int:
        v = 0
        for _ in range(t):
            v = (v << 1) | self.read_bit()
        return v

    def decode_symbol(self, tables) -> int:
        mincode, maxcode, valptr, huffval = tables
        code = 0
        for ln in range(1, 17):
            code = (code << 1) | self.read_bit()
            if maxcode[ln] >= 0 and code <= maxcode[ln]:
                return huffval[valptr[ln] + code - mincode[ln]]
        raise ValueError("invalid Huffman code in entropy stream")


def _category(v: int) -> int:
    a, t = abs(v), 0
    while a:
        t += 1
        a >>= 1
    return t


def _extend(v: int, t: int) -> int:
    """T.81 F.2.2.1 EXTEND: recover the signed value from t raw bits."""
    return v if t == 0 or v >= (1 << (t - 1)) else v - (1 << t) + 1


# -------------------------------------------------------------- encoder


def _seg(marker: int, payload: bytes) -> bytes:
    return struct.pack(">BBH", 0xFF, marker, len(payload) + 2) + payload


def encode_jpeg_gray8(blocks_zq: np.ndarray, width: int, height: int,
                      qtable_zz: np.ndarray | None = None,
                      dc_spec=(DC_BITS, DC_HUFFVAL),
                      ac_spec=(AC_BITS, AC_HUFFVAL)) -> bytes:
    """Emit a spec-valid baseline JFIF byte stream for one grayscale
    component from QUANTIZED zigzag-order coefficient blocks
    (``blocks_zq``: [n_blocks, 64] ints, blocks in raster order).
    Real DC differential coding, AC run/size with ZRL and EOB, byte
    stuffing, and canonical Huffman codes built from ``dc_spec`` /
    ``ac_spec`` — pass a variable-length table spec to exercise
    non-uniform code sizes (the unit tests do)."""
    if width % 8 or height % 8:
        raise ValueError("dimensions must be multiples of 8")
    nb = (width // 8) * (height // 8)
    if blocks_zq.shape != (nb, 64):
        raise ValueError("coefficient block count disagrees with dims")
    q = QTABLE_ZZ if qtable_zz is None else np.asarray(qtable_zz)

    dc_codes = canonical_codes(*dc_spec)
    ac_codes = canonical_codes(*ac_spec)
    bw = _BitWriter()
    pred = 0
    for zq in blocks_zq:
        diff = int(zq[0]) - pred
        pred = int(zq[0])
        t = _category(diff)
        code, size = dc_codes[t]
        bw.write(code, size)
        if t:
            bw.write(diff if diff > 0 else diff + (1 << t) - 1, t)
        nz = np.nonzero(zq[1:])[0]
        last = int(nz[-1]) + 1 if len(nz) else 0
        run = 0
        for k in range(1, last + 1):
            v = int(zq[k])
            if v == 0:
                run += 1
                continue
            while run >= 16:
                c, s = ac_codes[0xF0]        # ZRL: sixteen zeros
                bw.write(c, s)
                run -= 16
            t = _category(v)
            c, s = ac_codes[(run << 4) | t]
            bw.write(c, s)
            bw.write(v if v > 0 else v + (1 << t) - 1, t)
            run = 0
        if last != 63:
            c, s = ac_codes[0x00]            # EOB
            bw.write(c, s)

    app0 = b"JFIF\x00" + bytes([1, 1, 0]) + struct.pack(">HHBB", 1, 1, 0, 0)
    dqt = bytes([0x00]) + bytes(int(x) for x in q)
    sof0 = struct.pack(">BHHB", 8, height, width, 1) + bytes([1, 0x11, 0])
    dht_dc = bytes([0x00]) + bytes(dc_spec[0]) + bytes(dc_spec[1])
    dht_ac = bytes([0x10]) + bytes(ac_spec[0]) + bytes(ac_spec[1])
    sos = bytes([1, 1, 0x00, 0, 63, 0])
    return (b"\xff\xd8"                      # SOI
            + _seg(0xE0, app0) + _seg(0xDB, dqt) + _seg(0xC0, sof0)
            + _seg(0xC4, dht_dc) + _seg(0xC4, dht_ac) + _seg(0xDA, sos)
            + bw.flush()
            + b"\xff\xd9")                   # EOI


# -------------------------------------------------------------- decoder

_DCT_A: np.ndarray | None = None


def _dct_matrix() -> np.ndarray:
    global _DCT_A
    if _DCT_A is None:
        x = np.arange(8, dtype=np.float64)
        u = np.arange(8, dtype=np.float64)[:, None]
        a = np.cos((2 * x + 1) * u * np.pi / 16) / 2.0
        a[0] /= math.sqrt(2.0)
        _DCT_A = a
    return _DCT_A


def idct2(coeffs: np.ndarray) -> np.ndarray:
    """Orthonormal 2-D inverse DCT of one natural-order 8x8 block."""
    a = _dct_matrix()
    return a.T @ coeffs @ a


def decode_jpeg_gray8(raw: bytes):
    """REAL baseline JPEG decode (grayscale subset). Returns
    ``(width, height, zq, img)`` where ``zq`` is the [n_blocks, 64]
    int64 array of QUANTIZED coefficients in zigzag order exactly as
    entropy-decoded (raster block order), and ``img`` is the [H, W]
    int64 pixel array after dequantize + IDCT + level shift + clamp.
    Raises ValueError on anything outside the supported subset or any
    malformed structure."""
    if raw[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG: bad SOI marker")
    pos = 2
    qtables: dict[int, np.ndarray] = {}
    htables: dict[tuple[int, int], tuple] = {}
    width = height = None
    q_id = dc_id = ac_id = None
    scan_pos = None
    while pos + 4 <= len(raw):
        if raw[pos] != 0xFF:
            raise ValueError("expected marker")
        marker = raw[pos + 1]
        if marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                      0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential (SOF0) supported")
        (ln,) = struct.unpack(">H", raw[pos + 2:pos + 4])
        data = raw[pos + 4:pos + 2 + ln]
        if marker == 0xDB:                   # DQT (possibly several)
            p = 0
            while p < len(data):
                pq, tq = data[p] >> 4, data[p] & 0xF
                if pq != 0:
                    raise ValueError("only 8-bit quant tables supported")
                qtables[tq] = np.frombuffer(
                    data[p + 1:p + 65], dtype=np.uint8).astype(np.int64)
                p += 65
        elif marker == 0xC4:                 # DHT (possibly several)
            p = 0
            while p < len(data):
                tc, th = data[p] >> 4, data[p] & 0xF
                bits = list(data[p + 1:p + 17])
                n = sum(bits)
                huffval = list(data[p + 17:p + 17 + n])
                htables[(tc, th)] = _decode_tables(bits, huffval)
                p += 17 + n
        elif marker == 0xC0:                 # SOF0
            prec, height, width, ncomp = struct.unpack(">BHHB", data[:6])
            if prec != 8 or ncomp != 1:
                raise ValueError("only 8-bit single-component supported")
            if data[7] != 0x11:
                raise ValueError("subsampling not supported for grayscale")
            if width % 8 or height % 8:
                raise ValueError("dimensions must be multiples of 8")
            q_id = data[8]
        elif marker == 0xDA:                 # SOS — entropy data follows
            if data[0] != 1:
                raise ValueError("scan must carry exactly one component")
            dc_id, ac_id = data[2] >> 4, data[2] & 0xF
            if tuple(data[3:6]) != (0, 63, 0):
                raise ValueError("spectral selection must be 0..63 baseline")
            scan_pos = pos + 2 + ln
            break
        elif marker in (0xD0, 0xD1, 0xD2, 0xD3, 0xD4, 0xD5, 0xD6, 0xD7):
            raise ValueError("restart markers not supported")
        # APPn / COM / anything else: skip by declared length
        pos += 2 + ln
    if scan_pos is None or width is None:
        raise ValueError("missing SOF0 or SOS segment")
    if q_id not in qtables:
        raise ValueError("SOF0 references an undeclared quant table")
    if (0, dc_id) not in htables or (1, ac_id) not in htables:
        raise ValueError("SOS references an undeclared Huffman table")
    if raw[-2:] != b"\xff\xd9":
        raise ValueError("missing EOI marker")

    q_zz = qtables[q_id]
    dc_tab = htables[(0, dc_id)]
    ac_tab = htables[(1, ac_id)]
    nb = (width // 8) * (height // 8)
    br = _BitReader(raw[:-2], scan_pos)
    zq = np.zeros((nb, 64), dtype=np.int64)
    pred = 0
    for b in range(nb):
        t = br.decode_symbol(dc_tab)
        diff = _extend(br.read_bits(t), t) if t else 0
        pred += diff
        zq[b, 0] = pred
        k = 1
        while k <= 63:
            sym = br.decode_symbol(ac_tab)
            if sym == 0x00:                  # EOB
                break
            run, size = sym >> 4, sym & 0xF
            if size == 0:
                if run != 15:
                    raise ValueError("invalid AC run/size symbol")
                k += 16                      # ZRL
                continue
            k += run
            if k > 63:
                raise ValueError("AC coefficient index past 63")
            zq[b, k] = _extend(br.read_bits(size), size)
            k += 1

    # dequantize, de-zigzag, IDCT, level shift, clamp
    img = np.zeros((height, width), dtype=np.int64)
    bx = width // 8
    deq_zz = zq * q_zz                       # [nb, 64]
    for b in range(nb):
        nat = np.zeros((8, 8), dtype=np.float64)
        for k, (r, c) in enumerate(ZIGZAG):
            nat[r, c] = deq_zz[b, k]
        px = np.floor(idct2(nat) + 128.5)
        r0, c0 = (b // bx) * 8, (b % bx) * 8
        img[r0:r0 + 8, c0:c0 + 8] = np.clip(px, 0, 255).astype(np.int64)
    return width, height, zq, img
