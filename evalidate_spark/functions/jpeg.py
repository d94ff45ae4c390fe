"""Zero-dependency baseline JPEG codec (ITU-T T.81 / JFIF, public spec).

Pure ``struct`` + numpy — no PIL/libjpeg.  This upgrades the LAST stubbed
dominant image format in :mod:`.multimodal` to a real decode path (PNG and
BMP are already real in :mod:`.codecs`).

Decoder (``decode_jpeg``): baseline sequential DCT (SOF0), 8-bit,
grayscale or YCbCr, ANY sampling factors up to 2×2 (4:4:4, 4:2:2, 4:2:0),
restart markers (DRI/RSTn), multi-table DQT/DHT segments.  Huffman tables
are built from the file's own DHT segments, so any encoder's tables work.
Progressive (SOF2) and arithmetic coding are rejected with a clear error.

Encoder (``encode_jpeg``): baseline SOF0, 4:4:4 or 4:2:0, standard
Annex-K quantisation tables scaled by IJG quality.  Entropy tables are
SELF-GENERATED canonical Huffman tables (all 12 DC symbols at 4 bits, all
162 AC symbols at 8 bits — prefix-free by equal length, no all-ones
code) and emitted in DHT; compression is a little worse than the Annex-K
defaults but correctness never depends on transcribing the 162-entry
standard tables.

Everything here is per-payload work executed inside Arrow-batched
``mapInPandas`` workers (:mod:`.multimodal`); nothing touches the driver.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

import numpy as np

# zigzag index -> raster index (T.81 Figure 5)
ZIGZAG = np.array(
    [
        0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
        12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
        35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
        58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
    ],
    dtype=np.int64,
)

# Annex K quantisation tables (raster order)
QUANT_LUMA = np.array(
    [
        16, 11, 10, 16, 24, 40, 51, 61,
        12, 12, 14, 19, 26, 58, 60, 55,
        14, 13, 16, 24, 40, 57, 69, 56,
        14, 17, 22, 29, 51, 87, 80, 62,
        18, 22, 37, 56, 68, 109, 103, 77,
        24, 35, 55, 64, 81, 104, 113, 92,
        49, 64, 78, 87, 103, 121, 120, 101,
        72, 92, 95, 98, 112, 100, 103, 99,
    ],
    dtype=np.int64,
)
QUANT_CHROMA = np.array(
    [
        17, 18, 24, 47, 99, 99, 99, 99,
        18, 21, 26, 66, 99, 99, 99, 99,
        24, 26, 56, 99, 99, 99, 99, 99,
        47, 66, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
        99, 99, 99, 99, 99, 99, 99, 99,
    ],
    dtype=np.int64,
)

_C = np.sqrt(2.0 / 8.0) * np.cos(
    np.pi * np.outer(np.arange(8), (2 * np.arange(8) + 1)) / 16.0
)
_C[0, :] = 1.0 / np.sqrt(8.0)  # orthonormal DCT-II basis


def _dct2(block: np.ndarray) -> np.ndarray:
    return _C @ block @ _C.T


def _idct2(coef: np.ndarray) -> np.ndarray:
    return _C.T @ coef @ _C


def _scaled_quant(base: np.ndarray, quality: int) -> np.ndarray:
    quality = min(100, max(1, int(quality)))
    scale = 5000 // quality if quality < 50 else 200 - 2 * quality
    return np.clip((base * scale + 50) // 100, 1, 255).astype(np.int64)


# --------------------------------------------------------------- bit I/O
class _BitWriter:
    def __init__(self) -> None:
        self.buf = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, length: int) -> None:
        self.acc = (self.acc << length) | (value & ((1 << length) - 1))
        self.nbits += length
        while self.nbits >= 8:
            self.nbits -= 8
            byte = (self.acc >> self.nbits) & 0xFF
            self.buf.append(byte)
            if byte == 0xFF:  # byte stuffing
                self.buf.append(0x00)

    def pad(self) -> None:
        if self.nbits:
            n = 8 - self.nbits
            self.write((1 << n) - 1, n)  # pad with 1s (stuffed if 0xFF)

    def marker(self, byte: int) -> None:
        self.pad()
        self.buf += bytes([0xFF, byte])

    def flush(self) -> bytes:
        self.pad()
        return bytes(self.buf)


class _BitReader:
    """MSB-first reader over entropy-coded data with 0xFF00 unstuffing;
    stops at any non-RST marker.  ``restart()`` realigns after RSTn."""

    def __init__(self, data: bytes, pos: int) -> None:
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0

    def _fill(self) -> None:
        d = self.data
        if self.pos >= len(d):
            raise ValueError("truncated JPEG entropy stream")
        b = d[self.pos]
        if b == 0xFF:
            nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
            if nxt == 0x00:
                self.pos += 2
            else:
                raise ValueError("marker inside entropy stream")
        else:
            self.pos += 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def read_bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        return (self.acc >> self.nbits) & 1

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def at_restart(self) -> bool:
        d = self.data
        return (
            self.pos + 1 < len(d)
            and d[self.pos] == 0xFF
            and 0xD0 <= d[self.pos + 1] <= 0xD7
        )

    def restart(self) -> None:
        self.acc = 0
        self.nbits = 0
        self.pos += 2  # consume FF Dn


def _extend(v: int, t: int) -> int:
    """T.81 F.12: map t magnitude bits to a signed value."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ----------------------------------------------------------- Huffman
def _canonical_codes(counts: List[int], symbols: List[int]) -> Dict[int, Tuple[int, int]]:
    """DHT (counts per length 1..16, symbol list) → {symbol: (code, len)}."""
    out: Dict[int, Tuple[int, int]] = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            out[symbols[k]] = (code, length)
            code += 1
            k += 1
        code <<= 1
    return out


class _HuffDecoder:
    def __init__(self, counts: List[int], symbols: List[int]) -> None:
        self.lut: Dict[Tuple[int, int], int] = {}
        for sym, (code, length) in _canonical_codes(counts, symbols).items():
            self.lut[(length, code)] = sym

    def decode(self, br: _BitReader) -> int:
        code = 0
        for length in range(1, 17):
            code = (code << 1) | br.read_bit()
            sym = self.lut.get((length, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


# encoder-side fixed tables: every DC symbol 4 bits, every AC symbol 8 bits
_ENC_DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC_SYMBOLS = list(range(12))
_ENC_AC_SYMBOLS = [0x00, 0xF0] + [
    (r << 4) | s for r in range(16) for s in range(1, 11)
]
_ENC_AC_COUNTS = [0, 0, 0, 0, 0, 0, 0, len(_ENC_AC_SYMBOLS), 0, 0, 0, 0, 0, 0, 0, 0]
_ENC_DC = _canonical_codes(_ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
_ENC_AC = _canonical_codes(_ENC_AC_COUNTS, _ENC_AC_SYMBOLS)


def _category(v: int) -> int:
    return int(v).bit_length() if v >= 0 else int(-v).bit_length()


def _magnitude_bits(v: int, t: int) -> int:
    return v if v >= 0 else v + (1 << t) - 1


# --------------------------------------------------------------- encoder
def _encode_block(
    bw: _BitWriter, block: np.ndarray, qtab: np.ndarray, pred: int
) -> int:
    coef = _dct2(block.astype(np.float64) - 128.0)
    # clamp to the baseline coefficient range: keeps DC-diff categories
    # ≤ 11 and AC categories ≤ 10 even for extreme blocks at quality 100
    q = np.clip(
        np.rint(coef.reshape(64) / qtab).astype(np.int64), -1023, 1023
    )[ZIGZAG]
    dc = int(q[0])
    diff = dc - pred
    t = _category(diff)
    code, ln = _ENC_DC[t]
    bw.write(code, ln)
    if t:
        bw.write(_magnitude_bits(diff, t), t)
    run = 0
    last_nz = int(np.max(np.nonzero(q)[0])) if np.any(q[1:]) else 0
    for i in range(1, 64):
        v = int(q[i])
        if i > last_nz:
            break
        if v == 0:
            run += 1
            continue
        while run >= 16:
            code, ln = _ENC_AC[0xF0]
            bw.write(code, ln)
            run -= 16
        t = _category(v)
        code, ln = _ENC_AC[(run << 4) | t]
        bw.write(code, ln)
        bw.write(_magnitude_bits(v, t), t)
        run = 0
    if last_nz < 63:
        code, ln = _ENC_AC[0x00]
        bw.write(code, ln)
    return dc


def _block_grid(plane: np.ndarray) -> np.ndarray:
    """Pad a 2-D plane to multiples of 8 (edge-replicate) and return
    [by, bx, 8, 8] blocks."""
    h, w = plane.shape
    ph, pw = (-h) % 8, (-w) % 8
    p = np.pad(plane, ((0, ph), (0, pw)), mode="edge")
    bh, bw_ = p.shape[0] // 8, p.shape[1] // 8
    return p.reshape(bh, 8, bw_, 8).transpose(0, 2, 1, 3)


def _dht_segment(tclass: int, tid: int, counts: List[int], symbols: List[int]) -> bytes:
    body = bytes([(tclass << 4) | tid]) + bytes(counts) + bytes(symbols)
    return b"\xff\xc4" + struct.pack(">H", 2 + len(body)) + body


def encode_jpeg(
    pixels: np.ndarray,
    quality: int = 85,
    subsample: bool = False,
    restart_interval: int = 0,
) -> bytes:
    """uint8 ``[H, W, 3]`` RGB (or ``[H, W]`` grayscale) → baseline JFIF
    bytes.  ``subsample=True`` emits 4:2:0 (chroma averaged 2×2), else
    4:4:4.  ``restart_interval`` > 0 emits DRI + RSTn markers every that
    many MCUs (what real-world encoders do for error resilience)."""
    px = np.asarray(pixels)
    if px.ndim == 2:
        px = px[:, :, None]
    if px.ndim != 3 or px.shape[2] not in (1, 3):
        raise ValueError("expected [H, W, 3] RGB or [H, W] grayscale")
    h, w = px.shape[:2]
    if h == 0 or w == 0:
        raise ValueError("empty image")
    gray = px.shape[2] == 1
    f = px.astype(np.float64)
    if gray:
        planes = [f[:, :, 0]]
    else:
        r, g, b = f[:, :, 0], f[:, :, 1], f[:, :, 2]
        y = 0.299 * r + 0.587 * g + 0.114 * b
        cb = -0.168736 * r - 0.331264 * g + 0.5 * b + 128.0
        cr = 0.5 * r - 0.418688 * g - 0.081312 * b + 128.0
        if subsample:
            ph, pw = (-h) % 2, (-w) % 2
            cb = np.pad(cb, ((0, ph), (0, pw)), mode="edge")
            cr = np.pad(cr, ((0, ph), (0, pw)), mode="edge")
            cb = cb.reshape(cb.shape[0] // 2, 2, cb.shape[1] // 2, 2).mean((1, 3))
            cr = cr.reshape(cr.shape[0] // 2, 2, cr.shape[1] // 2, 2).mean((1, 3))
        planes = [y, cb, cr]

    ql = _scaled_quant(QUANT_LUMA, quality)[ZIGZAG].astype(np.float64)
    qc = _scaled_quant(QUANT_CHROMA, quality)[ZIGZAG].astype(np.float64)
    # NB: tables stored zigzag-ordered; _encode_block quantises zigzagged
    # coefficients, so feed it the zigzag-ordered table
    out = bytearray(b"\xff\xd8")  # SOI
    out += (
        b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x01\x00"
        + struct.pack(">HH", 1, 1) + b"\x00\x00"
    )
    zq_l = _scaled_quant(QUANT_LUMA, quality)[ZIGZAG]
    out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x00" + bytes(int(v) for v in zq_l)
    if not gray:
        zq_c = _scaled_quant(QUANT_CHROMA, quality)[ZIGZAG]
        out += b"\xff\xdb" + struct.pack(">H", 67) + b"\x01" + bytes(int(v) for v in zq_c)
    nf = 1 if gray else 3
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * nf, 8, h, w, nf)
    samp_y = 0x22 if (subsample and not gray) else 0x11
    out += bytes([1, samp_y, 0])
    if not gray:
        out += bytes([2, 0x11, 1, 3, 0x11, 1])
    out += _dht_segment(0, 0, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
    out += _dht_segment(1, 0, _ENC_AC_COUNTS, _ENC_AC_SYMBOLS)
    if not gray:
        out += _dht_segment(0, 1, _ENC_DC_COUNTS, _ENC_DC_SYMBOLS)
        out += _dht_segment(1, 1, _ENC_AC_COUNTS, _ENC_AC_SYMBOLS)
    if restart_interval:
        out += b"\xff\xdd" + struct.pack(">HH", 4, restart_interval)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * nf, nf)
    out += bytes([1, 0x00])
    if not gray:
        out += bytes([2, 0x11, 3, 0x11])
    out += bytes([0, 63, 0])

    grids = [_block_grid(p) for p in planes]
    bw = _BitWriter()
    preds = [0] * len(planes)
    mcu_n = 0

    def mcu_boundary() -> None:
        nonlocal mcu_n
        if restart_interval and mcu_n and mcu_n % restart_interval == 0:
            bw.marker(0xD0 + ((mcu_n // restart_interval - 1) % 8))
            for i in range(len(preds)):
                preds[i] = 0
        mcu_n += 1

    if gray:
        gy = grids[0]
        for by in range(gy.shape[0]):
            for bx in range(gy.shape[1]):
                mcu_boundary()
                preds[0] = _encode_block(bw, gy[by, bx], ql, preds[0])
    elif not subsample:
        n_by, n_bx = grids[0].shape[:2]
        for by in range(n_by):
            for bx in range(n_bx):
                mcu_boundary()
                for ci, qtab in ((0, ql), (1, qc), (2, qc)):
                    preds[ci] = _encode_block(bw, grids[ci][by, bx], qtab, preds[ci])
    else:
        # 4:2:0 MCU = 4 luma blocks (2×2) + 1 Cb + 1 Cr
        gy, gcb, gcr = grids
        mby, mbx = gcb.shape[0], gcb.shape[1]
        # luma grid padded to an even number of blocks
        if gy.shape[0] < 2 * mby or gy.shape[1] < 2 * mbx:
            pad_y = np.zeros((2 * mby, 2 * mbx, 8, 8))
            pad_y[: gy.shape[0], : gy.shape[1]] = gy
            for i in range(gy.shape[0], 2 * mby):
                pad_y[i] = pad_y[gy.shape[0] - 1]
            for j in range(gy.shape[1], 2 * mbx):
                pad_y[:, j] = pad_y[:, gy.shape[1] - 1]
            gy = pad_y
        for my in range(mby):
            for mx in range(mbx):
                mcu_boundary()
                for dy in range(2):
                    for dx in range(2):
                        preds[0] = _encode_block(
                            bw, gy[2 * my + dy, 2 * mx + dx], ql, preds[0]
                        )
                preds[1] = _encode_block(bw, gcb[my, mx], qc, preds[1])
                preds[2] = _encode_block(bw, gcr[my, mx], qc, preds[2])
    out += bw.flush()
    out += b"\xff\xd9"  # EOI
    return bytes(out)


# --------------------------------------------------------------- decoder
def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JFIF bytes → uint8 ``[H, W, 3]`` RGB (grayscale files are
    replicated to 3 channels)."""
    if data[:2] != b"\xff\xd8":
        raise ValueError("not a JPEG (missing SOI)")
    pos = 2
    qtabs: Dict[int, np.ndarray] = {}
    huff: Dict[Tuple[int, int], _HuffDecoder] = {}
    restart_interval = 0
    frame = None
    while pos < len(data):
        if data[pos] != 0xFF:
            raise ValueError("bad marker sync")
        marker = data[pos + 1]
        pos += 2
        if marker == 0xD9:  # EOI
            break
        if marker in (0x01,) or 0xD0 <= marker <= 0xD7:
            continue  # standalone
        seglen = struct.unpack(">H", data[pos : pos + 2])[0]
        seg = data[pos + 2 : pos + seglen]
        if marker == 0xDB:  # DQT (possibly several tables)
            i = 0
            while i < len(seg):
                pq, tq = seg[i] >> 4, seg[i] & 0xF
                if pq != 0:
                    raise ValueError("16-bit quant tables unsupported")
                tbl = np.zeros(64, dtype=np.int64)
                tbl[ZIGZAG] = np.frombuffer(seg[i + 1 : i + 65], dtype=np.uint8)
                qtabs[tq] = tbl
                i += 65
        elif marker == 0xC4:  # DHT (possibly several tables)
            i = 0
            while i < len(seg):
                tc, th = seg[i] >> 4, seg[i] & 0xF
                counts = list(seg[i + 1 : i + 17])
                n = sum(counts)
                symbols = list(seg[i + 17 : i + 17 + n])
                huff[(tc, th)] = _HuffDecoder(counts, symbols)
                i += 17 + n
        elif marker == 0xDD:  # DRI
            restart_interval = struct.unpack(">H", seg[:2])[0]
        elif marker == 0xC0 or marker == 0xC1:  # SOF0/1 baseline
            prec, fh, fw, nf = struct.unpack(">BHHB", seg[:6])
            if prec != 8:
                raise ValueError("only 8-bit precision supported")
            comps = []
            for c in range(nf):
                cid, samp, tq = seg[6 + 3 * c : 9 + 3 * c]
                comps.append({"id": cid, "h": samp >> 4, "v": samp & 0xF, "tq": tq})
            frame = {"h": fh, "w": fw, "comps": comps}
        elif marker in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
            raise ValueError("only baseline sequential JPEG is supported")
        elif marker == 0xDA:  # SOS — entropy data follows
            if frame is None:
                raise ValueError("SOS before SOF")
            ns = seg[0]
            tabsel = {}
            for c in range(ns):
                cid, tt = seg[1 + 2 * c], seg[2 + 2 * c]
                tabsel[cid] = (tt >> 4, tt & 0xF)
            return _decode_scan(
                data, pos + seglen, frame, qtabs, huff, tabsel, restart_interval
            )
        pos += seglen
    raise ValueError("no scan data found")


def _decode_scan(data, pos, frame, qtabs, huff, tabsel, restart_interval):
    comps = frame["comps"]
    fh, fw = frame["h"], frame["w"]
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if hmax > 2 or vmax > 2 or any(c["h"] not in (1, 2) or c["v"] not in (1, 2) for c in comps):
        raise ValueError("sampling factors beyond 2x2 unsupported")
    mcux = (fw + 8 * hmax - 1) // (8 * hmax)
    mcuy = (fh + 8 * vmax - 1) // (8 * vmax)
    planes = [
        np.zeros((mcuy * c["v"] * 8, mcux * c["h"] * 8), dtype=np.float64)
        for c in comps
    ]
    br = _BitReader(data, pos)
    preds = [0] * len(comps)
    mcu_count = 0
    for my in range(mcuy):
        for mx in range(mcux):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if br.at_restart():
                    br.restart()
                    preds = [0] * len(comps)
            for ci, comp in enumerate(comps):
                dc_t, ac_t = tabsel[comp["id"]]
                dtab, atab = huff[(0, dc_t)], huff[(1, ac_t)]
                qtab = qtabs[comp["tq"]]
                for dy in range(comp["v"]):
                    for dx in range(comp["h"]):
                        zz = np.zeros(64, dtype=np.int64)
                        t = dtab.decode(br)
                        diff = _extend(br.read_bits(t), t) if t else 0
                        preds[ci] += diff
                        zz[0] = preds[ci]
                        k = 1
                        while k < 64:
                            rs = atab.decode(br)
                            r, s = rs >> 4, rs & 0xF
                            if s == 0:
                                if r == 15:
                                    k += 16
                                    continue
                                break  # EOB
                            k += r
                            if k > 63:
                                raise ValueError("AC index overflow")
                            zz[k] = _extend(br.read_bits(s), s)
                            k += 1
                        coef = np.zeros(64, dtype=np.float64)
                        coef[ZIGZAG] = (zz * qtab[ZIGZAG]).astype(np.float64)
                        blk = _idct2(coef.reshape(8, 8)) + 128.0
                        y0 = (my * comp["v"] + dy) * 8
                        x0 = (mx * comp["h"] + dx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = blk
            mcu_count += 1
    # upsample to full resolution and crop
    full = []
    for ci, comp in enumerate(comps):
        p = planes[ci]
        ry, rx = vmax // comp["v"], hmax // comp["h"]
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        full.append(p[:fh, :fw])
    if len(full) == 1:
        y = np.clip(full[0], 0, 255).astype(np.uint8)
        return np.stack([y, y, y], axis=2)
    y, cb, cr = full[0], full[1] - 128.0, full[2] - 128.0
    r = y + 1.402 * cr
    g = y - 0.344136 * cb - 0.714136 * cr
    b = y + 1.772 * cb
    return np.clip(np.stack([r, g, b], axis=2).round(), 0, 255).astype(np.uint8)
