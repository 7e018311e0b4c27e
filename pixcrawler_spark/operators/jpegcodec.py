"""Baseline JPEG codec, pure numpy + stdlib — no PIL/libjpeg.

The reference validates crawled images with PIL over real-world
formats (reference: validator/integrity.py:108-215,473-498); jpeg is
the most common of them. This module gives the Spark engine a REAL
jpeg path in a container without codec libraries:

- ``jpeg_decode``: general baseline decoder — marker parse (DQT/SOF0/
  DHT/SOS/DRI), Huffman entropy decode with byte-unstuffing + restart
  markers, dequantize, de-zigzag, 8x8 IDCT (orthonormal matrix — the
  exact DCT the spec defines, not an approximation), sampling-factor
  upsample, YCbCr->RGB (BT.601). Returns None for corrupt/truncated/
  unsupported streams (progressive, arithmetic, 12-bit) — the same
  corruption-predicate contract as the BMP/PNG decoders.
- ``jpeg_encode``: baseline 4:4:4 (or single-component grayscale)
  encoder used by fixtures and oracle-by-construction queries. It
  emits its OWN Huffman tables in DHT (flat canonical tables: every
  symbol fits in <= 9 bits, the all-ones code is never assigned as
  the spec requires), so nothing depends on memorized Annex-K code
  lists — the decoder reads whatever tables the stream declares,
  exactly like a real-world decoder must.

Quantization follows Annex K scaled by the IJG quality formula; at
the default quality the DC error per 8x8 block mean is < 1 gray
level, which is what lets aHash oracles survive the lossy round-trip
(the 40-vs-200 block margin is ~80 levels).
"""

from __future__ import annotations

import struct

import numpy as np

# zigzag position i -> raster index in the 8x8 block
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
], dtype=np.int64)

# ITU-T T.81 Annex K example quantization tables (raster order)
QUANT_LUMA = np.array([
    16, 11, 10, 16, 24, 40, 51, 61,
    12, 12, 14, 19, 26, 58, 60, 55,
    14, 13, 16, 24, 40, 57, 69, 56,
    14, 17, 22, 29, 51, 87, 80, 62,
    18, 22, 37, 56, 68, 109, 103, 77,
    24, 35, 55, 64, 81, 104, 113, 92,
    49, 64, 78, 87, 103, 121, 120, 101,
    72, 92, 95, 98, 112, 100, 103, 99,
], dtype=np.int64).reshape(8, 8)
QUANT_CHROMA = np.array([
    17, 18, 24, 47, 99, 99, 99, 99,
    18, 21, 26, 66, 99, 99, 99, 99,
    24, 26, 56, 99, 99, 99, 99, 99,
    47, 66, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
    99, 99, 99, 99, 99, 99, 99, 99,
], dtype=np.int64).reshape(8, 8)


def _scaled_quant(table: np.ndarray, quality: int) -> np.ndarray:
    """IJG quality scaling: 50 -> Annex K, 100 -> all-ones."""
    q = max(1, min(100, quality))
    scale = 5000 // q if q < 50 else 200 - 2 * q
    t = (table * scale + 50) // 100
    return np.clip(t, 1, 255)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II matrix T: F = T @ b @ T.T is exactly the
    spec's FDCT (T.81 A.3.3); the IDCT is its transpose pair."""
    x = np.arange(8)
    t = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16) * np.sqrt(2 / 8)
    t[0, :] = np.sqrt(1 / 8)
    return t

_T = _dct_matrix()


# ---------------------------------------------------------------------------
# Huffman table construction (encoder side): flat canonical tables.
# JPEG requires the all-1-bits code never be assigned (padding uses 1s).
def _flat_table(nsymbols: int):
    """(bits[1..16], values) canonical table: as many symbols as fit at
    the smallest length L with 2^L > nsymbols (so all-ones stays free),
    the remainder one bit longer."""
    length = 1
    while (1 << length) <= nsymbols:  # need strictly more codes than syms
        length += 1
    bits = [0] * 17
    # DHT stores per-length counts as single bytes, so cap at 255
    at_l = min(nsymbols, (1 << length) - 1, 255)
    bits[length] = at_l
    rest = nsymbols - at_l
    if rest:
        bits[length + 1] = rest
    return bits, list(range(nsymbols))


def _codes_from_bits(bits, values):
    """Canonical code assignment (T.81 C.2): {symbol: (code, length)}."""
    out, code = {}, 0
    k = 0
    for length in range(1, 17):
        for _ in range(bits[length]):
            out[values[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


DC_BITS, DC_VALUES = _flat_table(12)        # categories 0..11
AC_BITS, AC_VALUES = _flat_table(256)       # all run/size symbols
_DC_CODES = _codes_from_bits(DC_BITS, DC_VALUES)
_AC_CODES = _codes_from_bits(AC_BITS, AC_VALUES)


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code: int, length: int) -> None:
        self.acc = (self.acc << length) | (code & ((1 << length) - 1))
        self.n += length
        while self.n >= 8:
            byte = (self.acc >> (self.n - 8)) & 0xFF
            self.out.append(byte)
            if byte == 0xFF:
                self.out.append(0x00)  # byte stuffing
            self.n -= 8
        self.acc &= (1 << self.n) - 1

    def flush(self) -> bytes:
        if self.n:
            pad = 8 - self.n
            self.put((1 << pad) - 1, pad)  # pad with 1s per spec
        return bytes(self.out)


def _category(v: int) -> int:
    return int(v).bit_length() if v > 0 else int(-v).bit_length()


def _encode_block(bw: _BitWriter, coeffs: np.ndarray, pred: int) -> int:
    """Huffman-encode one quantized, zigzagged 64-coefficient block;
    returns the new DC predictor."""
    dc = int(coeffs[0])
    diff = dc - pred
    s = _category(diff)
    code, ln = _DC_CODES[s]
    bw.put(code, ln)
    if s:
        bw.put(diff if diff > 0 else diff + (1 << s) - 1, s)
    run = 0
    last_nz = 0
    nz = np.nonzero(coeffs[1:])[0]
    last_nz = (nz[-1] + 1) if nz.size else 0
    for i in range(1, last_nz + 1):
        v = int(coeffs[i])
        if v == 0:
            run += 1
            continue
        while run > 15:
            c, l = _AC_CODES[0xF0]  # ZRL
            bw.put(c, l)
            run -= 16
        s = _category(v)
        c, l = _AC_CODES[(run << 4) | s]
        bw.put(c, l)
        bw.put(v if v > 0 else v + (1 << s) - 1, s)
        run = 0
    if last_nz < 63:
        c, l = _AC_CODES[0x00]  # EOB
        bw.put(c, l)
    return dc


def _dht_segment(tc: int, th: int, bits, values) -> bytes:
    body = bytes([(tc << 4) | th]) + bytes(bits[1:]) + bytes(values)
    return b"\xff\xc4" + struct.pack(">H", len(body) + 2) + body


def jpeg_encode(pixels: np.ndarray, quality: int = 90) -> bytes:
    """(h, w, 3) uint8 RGB or (h, w) uint8 gray -> baseline JFIF bytes.
    3-component output is 4:4:4 (no subsampling); tables are embedded,
    so any conforming baseline decoder can read the stream."""
    gray_in = pixels.ndim == 2
    h, w = pixels.shape[:2]
    ql = _scaled_quant(QUANT_LUMA, quality)
    qc = _scaled_quant(QUANT_CHROMA, quality)
    if gray_in:
        planes = [pixels.astype(np.float64) - 128.0]
        quants = [ql]
    else:
        p = pixels.astype(np.float64)
        y = 0.299 * p[:, :, 0] + 0.587 * p[:, :, 1] + 0.114 * p[:, :, 2]
        cb = 128.0 - 0.168736 * p[:, :, 0] - 0.331264 * p[:, :, 1] + 0.5 * p[:, :, 2]
        cr = 128.0 + 0.5 * p[:, :, 0] - 0.418688 * p[:, :, 1] - 0.081312 * p[:, :, 2]
        planes = [y - 128.0, cb - 128.0, cr - 128.0]
        quants = [ql, qc, qc]

    out = bytearray(b"\xff\xd8")  # SOI
    # DQT (two tables when color)
    for tq, q in enumerate(quants[:2] if not gray_in else quants[:1]):
        zz = q.reshape(-1)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            int(v) for v in zz
        )
    # SOF0
    ncomp = 1 if gray_in else 3
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, 0x11, 0 if ci == 0 else 1])  # h=v=1
    out += b"\xff\xc0" + struct.pack(">H", len(sof) + 2) + sof
    # DHT: same flat tables for luma and (if color) chroma slots
    out += _dht_segment(0, 0, DC_BITS, DC_VALUES)
    out += _dht_segment(1, 0, AC_BITS, AC_VALUES)
    if not gray_in:
        out += _dht_segment(0, 1, DC_BITS, DC_VALUES)
        out += _dht_segment(1, 1, AC_BITS, AC_VALUES)
    # SOS
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00 if ci == 0 else 0x11])
    sos += bytes([0, 63, 0])
    out += b"\xff\xda" + struct.pack(">H", len(sos) + 2) + sos

    # entropy-coded data: interleaved MCUs = one block per component
    bh, bw_ = (h + 7) // 8, (w + 7) // 8
    padded = []
    for pl in planes:
        pp = np.empty((bh * 8, bw_ * 8))
        pp[:h, :w] = pl
        pp[h:, :w] = pl[h - 1 : h, :]  # edge replicate
        pp[:, w:] = pp[:, w - 1 : w]
        padded.append(pp)
    writer = _BitWriter()
    preds = [0] * ncomp
    for by in range(bh):
        for bx in range(bw_):
            for ci in range(ncomp):
                blk = padded[ci][by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                f = _T @ blk @ _T.T
                qz = np.rint(f / quants[ci]).astype(np.int64)
                coeffs = qz.reshape(-1)[ZIGZAG]
                preds[ci] = _encode_block(writer, coeffs, preds[ci])
    out += writer.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# ---------------------------------------------------------------------------
# Decoder
class _BitReader:
    """Entropy-segment bit reader: un-stuffs 0xFF00, surfaces restart
    markers, raises EOFError on truncation (-> corruption predicate)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.n = 0

    def _fill(self) -> None:
        if self.pos >= len(self.data):
            raise EOFError
        b = self.data[self.pos]
        if b == 0xFF:
            if self.pos + 1 >= len(self.data):
                raise EOFError
            nxt = self.data[self.pos + 1]
            if nxt == 0x00:
                self.pos += 2
            elif 0xD0 <= nxt <= 0xD7:
                raise _RestartMarker(nxt)
            else:
                raise EOFError  # EOI / unexpected marker mid-scan
        else:
            self.pos += 1
        # Mask off already-consumed high bits before shifting: without
        # this, acc grows into an unbounded bignum and every shift is
        # O(bytes consumed so far), making decode quadratic in
        # entropy-stream length (~54 s for a 242 KB stream — an
        # executor-hang DoS on this untrusted-input path).
        self.acc = (((self.acc & ((1 << self.n) - 1)) << 8)) | b
        self.n += 8

    def bit(self) -> int:
        if self.n == 0:
            self._fill()
        self.n -= 1
        return (self.acc >> self.n) & 1

    def bits(self, k: int) -> int:
        v = 0
        for _ in range(k):
            v = (v << 1) | self.bit()
        return v

    def sync_restart(self) -> None:
        """Consume a restart marker at the byte boundary."""
        self.acc = 0
        self.n = 0
        while self.pos + 1 < len(self.data) and not (
            self.data[self.pos] == 0xFF and 0xD0 <= self.data[self.pos + 1] <= 0xD7
        ):
            self.pos += 1
        if self.pos + 1 >= len(self.data):
            raise EOFError
        self.pos += 2


class _RestartMarker(Exception):
    def __init__(self, marker: int):
        self.marker = marker


class _HuffTable:
    """(length, code) -> symbol lookup built from a DHT segment."""

    def __init__(self, bits, values):
        self.map = {}
        code, k = 0, 0
        for length in range(1, 17):
            for _ in range(bits[length]):
                self.map[(length, code)] = values[k]
                code += 1
                k += 1
            code <<= 1

    def decode(self, br: _BitReader) -> int:
        code, length = 0, 0
        while length < 16:
            code = (code << 1) | br.bit()
            length += 1
            sym = self.map.get((length, code))
            if sym is not None:
                return sym
        raise EOFError  # invalid code: corrupt stream


def _extend(v: int, s: int) -> int:
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _decode_block(br, dc_tab, ac_tab, pred: int):
    coeffs = np.zeros(64, dtype=np.int64)
    s = dc_tab.decode(br)
    if s > 11:
        raise EOFError
    diff = _extend(br.bits(s), s) if s else 0
    dc = pred + diff
    coeffs[0] = dc
    i = 1
    while i < 64:
        rs = ac_tab.decode(br)
        r, s = rs >> 4, rs & 0x0F
        if s == 0:
            if r == 15:  # ZRL
                i += 16
                continue
            break  # EOB
        i += r
        if i > 63:
            raise EOFError
        coeffs[i] = _extend(br.bits(s), s)
        i += 1
    return coeffs, dc


def jpeg_decode(payload: bytes, want_rgb: bool = False):
    """Baseline JFIF -> (width, height, grayscale float64 (h, w)
    [, (h, w, 3) uint8 RGB]) or None for corrupt / truncated /
    non-baseline streams — same contract as the BMP/PNG decoders."""
    try:
        if len(payload) < 4 or payload[:2] != b"\xff\xd8":
            return None
        pos = 2
        quants: dict[int, np.ndarray] = {}
        huff: dict[tuple[int, int], _HuffTable] = {}
        comps = None  # list of (id, h, v, tq)
        w = h = 0
        restart_interval = 0
        data = payload
        while pos + 4 <= len(data):
            if data[pos] != 0xFF:
                return None
            marker = data[pos + 1]
            if marker == 0xD9:  # EOI before SOS
                return None
            (seglen,) = struct.unpack_from(">H", data, pos + 2)
            body = data[pos + 4 : pos + 2 + seglen]
            if len(body) != seglen - 2:
                return None  # truncated segment
            if marker == 0xDB:  # DQT
                b = body
                while b:
                    pq, tq = b[0] >> 4, b[0] & 0x0F
                    if pq != 0 or len(b) < 65:
                        return None  # 16-bit tables unsupported
                    t = np.zeros(64, dtype=np.int64)
                    t[ZIGZAG] = np.frombuffer(b[1:65], dtype=np.uint8)
                    quants[tq] = t.reshape(8, 8)
                    b = b[65:]
            elif marker == 0xC0:  # SOF0 baseline
                prec, h, w, nf = struct.unpack_from(">BHHB", body, 0)
                if prec != 8 or nf < 1 or nf > 4 or w == 0 or h == 0:
                    return None
                comps = []
                for i in range(nf):
                    cid, hv, tq = body[6 + 3 * i : 9 + 3 * i]
                    comps.append((cid, hv >> 4, hv & 0x0F, tq))
            elif marker in (0xC1, 0xC2, 0xC3, 0xC5, 0xC6, 0xC7,
                            0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # progressive/arithmetic/lossless: unsupported
            elif marker == 0xC4:  # DHT
                b = body
                while len(b) >= 17:
                    tc, th = b[0] >> 4, b[0] & 0x0F
                    bits = [0] + list(b[1:17])
                    n = sum(bits)
                    if len(b) < 17 + n:
                        return None
                    huff[(tc, th)] = _HuffTable(bits, list(b[17 : 17 + n]))
                    b = b[17 + n :]
            elif marker == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", body, 0)
            elif marker == 0xDA:  # SOS
                break
            pos += 2 + seglen
        else:
            return None
        if comps is None or not quants:
            return None
        ns = body[0]
        scan = []  # (component index, dc table, ac table)
        for i in range(ns):
            cid, tabs = body[1 + 2 * i], body[2 + 2 * i]
            ci = next(
                (k for k, c in enumerate(comps) if c[0] == cid), None
            )
            if ci is None:
                return None
            dc = huff.get((0, tabs >> 4))
            ac = huff.get((1, tabs & 0x0F))
            if dc is None or ac is None:
                return None
            scan.append((ci, dc, ac))
        br = _BitReader(data, pos + 2 + seglen)

        hmax = max(c[1] for c in comps)
        vmax = max(c[2] for c in comps)
        mcux = (w + 8 * hmax - 1) // (8 * hmax)
        mcuy = (h + 8 * vmax - 1) // (8 * vmax)
        planes = []
        for _, ch, cv, _tq in comps:
            planes.append(np.zeros((mcuy * cv * 8, mcux * ch * 8)))
        preds = [0] * len(comps)
        if ns != len(comps):
            return None  # non-interleaved multi-scan: unsupported
        mcu_count = 0
        for my in range(mcuy):
            for mx in range(mcux):
                if restart_interval and mcu_count and (
                    mcu_count % restart_interval == 0
                ):
                    try:
                        br.sync_restart()
                    except _RestartMarker:
                        pass
                    preds = [0] * len(comps)
                try:
                    for ci, dc_tab, ac_tab in scan:
                        _, ch, cv, tq = comps[ci]
                        q = quants.get(tq)
                        if q is None:
                            return None
                        for by in range(cv):
                            for bx in range(ch):
                                coeffs, preds[ci] = _decode_block(
                                    br, dc_tab, ac_tab, preds[ci]
                                )
                                blk = np.zeros(64, dtype=np.int64)
                                blk[ZIGZAG] = coeffs
                                f = blk.reshape(8, 8) * q
                                sp = _T.T @ f @ _T + 128.0
                                y0 = (my * cv + by) * 8
                                x0 = (mx * ch + bx) * 8
                                planes[ci][y0 : y0 + 8, x0 : x0 + 8] = sp
                except _RestartMarker:
                    return None  # restart mid-MCU: corrupt
                mcu_count += 1

        # upsample to full resolution and crop
        full = []
        for (cid, ch, cv, _tq), pl in zip(comps, planes):
            up = np.repeat(np.repeat(pl, vmax // cv, 0), hmax // ch, 1)
            full.append(up[:h, :w])
        if len(comps) == 1:
            g8 = np.clip(np.rint(full[0]), 0, 255).astype(np.uint8)
            rgb = np.stack([g8, g8, g8], axis=-1)
        else:
            y, cb, cr = full[0], full[1], full[2]
            r = y + 1.402 * (cr - 128.0)
            g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
            b = y + 1.772 * (cb - 128.0)
            rgb = np.clip(
                np.rint(np.stack([r, g, b], axis=-1)), 0, 255
            ).astype(np.uint8)
        p = rgb.astype(np.float64)
        gray = p[:, :, 0] * 0.299 + p[:, :, 1] * 0.587 + p[:, :, 2] * 0.114
        if want_rgb:
            return int(w), int(h), gray, rgb
        return int(w), int(h), gray
    except (EOFError, _RestartMarker, struct.error, IndexError, ValueError):
        return None
